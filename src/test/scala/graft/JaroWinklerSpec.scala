package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JaroWinkler
import graft.text.TextOps

class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Pinned against DuckDB 1.0.0 jaro_winkler_similarity (the oracle
  // engine) — exact doubles, no tolerance. The first three are Winkler's
  // classic examples; the rest pin edge semantics: empty handling, the
  // strict > 0.7 boost gate, and prefix capping.
  private val pinned = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("abc", "abc", 1.0),
    ("abc", "", 0.0),
    ("", "", 0.0),
    ("CRATE", "TRACE", 0.7333333333333334), // boosted branch, prefix 0
    ("ab", "abcdefghij", 0.7866666666666667), // jaro .7333 + 2-char prefix
    ("abcdxxxx", "abcdyyyyzzzz", 0.611111111111111), // <= 0.7: NO boost
    ("abhello", "abworldxy", 0.5886243386243386))

  test("pinned oracle values match bit-for-bit (scalar)") {
    for ((a, b, want) <- pinned)
      assert(JaroWinkler.sim(a, b) == want, s"sim($a, $b)")
  }

  test("pinned oracle values match through the registered SQL function") {
    val got = pinned.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(call_function("jaro_winkler", col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == pinned.map(_._3))
  }

  test("symmetric, bounded, null-safe") {
    val r = new scala.util.Random(11)
    for (_ <- 1 to 300) {
      val a = r.alphanumeric.take(r.nextInt(12)).mkString
      val b = r.alphanumeric.take(r.nextInt(12)).mkString
      val s = JaroWinkler.sim(a, b)
      assert(s == JaroWinkler.sim(b, a))
      assert(s >= 0.0 && s <= 1.0)
      if (a == b && a.nonEmpty) assert(s == 1.0)
    }
    val rows = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(call_function("jaro_winkler", col("a"), col("b"))).collect()
    assert(rows.head.isNullAt(0))
  }

  test("participates in codegen (no fallback to interpreted projection)") {
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(call_function("jaro_winkler", col("text"), col("source")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[jaro_winkler""".r.findFirstIn(plan).isDefined,
      plan.take(500))
  }

  test("blocked JW matching finds the planted transposed near-duplicate") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "s"),
      (2L, "alpha beta gamma delta epsilon zetta", "s"), // near-identical sig
      (3L, "totally different words entirely here", "s"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
    val out = TextOps.jaroWinklerMatches(docs).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(out.head.getDouble(2) >= 0.9)
  }
}
