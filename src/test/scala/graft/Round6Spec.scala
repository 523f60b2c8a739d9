package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Round6

/** Bit-equivalence of the native `round6` with Spark's `round(x, 6)`
  * (RoundBase HALF_UP over the shortest-decimal representation) — the
  * 6dp pre-rank rounding is the repo's cross-engine determinism
  * contract, so the fast path must NEVER diverge, including at the
  * half-boundary grid where binary/decimal representations disagree. */
class Round6Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sparkRound(xs: Seq[Double]): Array[Double] =
    xs.toDF("x").select(round(col("x"), 6).as("r"))
      .collect().map(_.getDouble(0))

  private def check(xs: Seq[Double]): Unit = {
    val want = sparkRound(xs)
    xs.zip(want).foreach { case (x, w) =>
      val got = Round6.round6(x)
      assert(java.lang.Double.doubleToRawLongBits(got) ==
        java.lang.Double.doubleToRawLongBits(w),
        s"round6($x) = $got, Spark round = $w")
    }
  }

  test("random doubles in the cosine range match Spark round exactly") {
    val rnd = new scala.util.Random(42)
    check(Seq.fill(20000)(rnd.nextDouble() * 2.0 - 1.0))
    check(Seq.fill(5000)(rnd.nextGaussian() * 1000.0))
  }

  test("adversarial half-boundary grid matches (fallback path)") {
    // values AT and NEAR k·1e-6 + 5e-7 — where binary y = x·1e6 sits
    // within the guard band of a half-integer and decimal-string
    // semantics decide the result
    val ks = (-2000000 to 2000000 by 37) ++ (-20 to 20)
    val grid = ks.flatMap { k =>
      val base = k * 1e-6 + 5e-7
      Seq(base, base + 1e-13, base - 1e-13,
        math.nextUp(base), math.nextDown(base))
    }
    check(grid)
  }

  test("specials: NaN, infinities, zeros, denormals, large magnitudes") {
    check(Seq(0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
      1e-300, -1e-300, 1.0, -1.0, 123456.7890123455, -123456.7890123455,
      4.5e9, -4.5e9, 4.5e15, 9.9e15, 1e18, -1e18, Double.MaxValue,
      -Double.MaxValue))
    val nanGot = Round6.round6(Double.NaN)
    assert(java.lang.Double.isNaN(nanGot))
    assert(Round6.round6(Double.PositiveInfinity).isPosInfinity)
    assert(Round6.round6(Double.NegativeInfinity).isNegInfinity)
  }

  test("SQL surface registered and codegen-evaluable") {
    graft.functions.GraftFunctions.register(spark)
    val rows = spark.sql(
      "SELECT round6(x) AS a, round(x, 6) AS b FROM VALUES " +
        "(0.1234565D), (-0.0000005D), (0.9999994999D) AS t(x)")
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }
}
