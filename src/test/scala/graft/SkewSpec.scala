package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Skew

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join returns exactly the plain join rows on a skewed key") {
    import spark.implicits._
    // 90% of the big side lands on key 1 — the skew shape
    val big = ((1 to 900).map(i => (1, s"v$i")) ++ (1 to 100).map(i => (i % 7 + 2, s"w$i")))
      .toDF("k", "payload")
    val small = Seq((1, "hot"), (2, "a"), (3, "b"), (4, "c")).toDF("k", "label")
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "label").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, Seq("k"), saltFactor = 8)
      .select("k", "payload", "label").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("salt spreads the hot key across multiple values") {
    import spark.implicits._
    val big = (1 to 500).map(i => (1, s"v$i")).toDF("k", "payload")
    val salts = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(8)))
      .select(countDistinct("__salt")).first().getLong(0)
    assert(salts > 4, s"hot key should spread over most of 8 salts, got $salts")
  }
}
