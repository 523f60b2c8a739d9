package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partitioning-invariance: the float-bearing queries must produce
  * IDENTICAL bits under different shuffle widths, or the DuckDB-oracle
  * strategy (and any retry/rescale on a real cluster) silently breaks.
  * This is the regression guard behind every design note that says
  * "fixed fold order" / "accumulates in one partition" / "integer counts
  * only" — change an operator to a partition-order-dependent float sum
  * and this fails before the driver's gate does.
  */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // float-heaviest representatives of each family: LM scoring (avg of
  // logs), entropy, interpolation, winsorized means, ADC distances,
  // TF-IDF ranking
  private val sensitive = Seq("td_unigram_logprob", "td_bigram_logprob",
    "td_entropy", "q45_interpolate", "q46_winsorize", "emb_pq_knn",
    "td_tfidf_top_term", "q1_agg", "q50_math_funcs", "td_source_kl")

  test("float-bearing queries are bit-identical across shuffle widths") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    def run(parts: String): Map[String, Seq[String]] = {
      spark.conf.set(key, parts)
      sensitive.map { n =>
        val rows = SparkEntry.queries(n)(spark, sf).collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
        n -> rows
      }.toMap
    }
    try {
      val narrow = run("3")
      val wide = run("29")
      sensitive.foreach { n =>
        assert(narrow(n) == wide(n), s"$n drifts with partitioning")
        assert(narrow(n).nonEmpty, s"$n returned no rows")
      }
    } finally spark.conf.set(key, prev)
  }
}
