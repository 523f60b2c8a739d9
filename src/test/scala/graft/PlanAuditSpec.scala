package graft

import org.scalatest.funsuite.AnyFunSuite

/** Codifies the scale discipline for the WHOLE query surface: every
  * registered query's executed plan is audited — no CartesianProduct
  * anywhere, and BroadcastNestedLoopJoin only in the operators that
  * choose it deliberately (kNN-style: tiny broadcast query set against a
  * non-equi condition). A new query that accidentally plans a nested
  * loop fails here, not at 100 TB.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Queries whose plan legitimately contains a BroadcastNestedLoopJoin:
    * a bounded broadcast side (the filtered query vectors / the centroid
    * table) against a non-equi join condition. The broadcast bound is the
    * query-set size, not the corpus. */
  private val bnljAllowed = Set(
    "emb_knn_brute", "emb_knn_topk", "emb_ivf_knn", "emb_ivf_nprobe2",
    "emb_quant_knn", "emb_mrl_rerank", "emb_mrl_recall", "emb_filtered_knn",
    // every vector scores against every centroid by design; the broadcast
    // side is the centroid table, bounded by cell count
    "emb_kmeans_step", "emb_pq_codes", "emb_pq_knn", "emb_ivfpq_knn",
    "emb_silhouette",
    // composes knnBruteForce + ivfSearch, so it inherits their intentional
    // broadcast-query-set scoring joins
    "emb_ann_recall",
    // the vector leg is knnBruteForce — same bounded broadcast query set
    "emb_hybrid_rrf",
    // label-mismatch is non-equi by design; broadcast side is the query set
    "emb_hard_negatives",
    // corpus-size N rides the plan as a ONE-ROW broadcast aggregate (the
    // alternative was a separate driver-side count()/first() job over the
    // corpus); a 1-row build side makes the nested loop a map-side
    // literal attach
    "td_tfidf_top_term", "td_pmi_pairs", "td_unigram_logprob",
    "td_bigram_logprob", "td_source_kl", "td_mixture_sample", "td_bm25",
    // composes unigramLogProb, inheriting its 1-row corpus-total attach
    "td_ppl_buckets",
    // two 1-row literal attaches: the mean array and the normalizer
    "emb_pca_power",
    // three 1-row count frames folded into one row
    "td_lsh_recall",
    // 1-row broadcast totals: sum_pow/sum_tokens, the bigram type count,
    // and the two distribution totals — same literal-attach shape
    "td_temperature_mix", "td_kneser_ney", "td_dsir")

  test("no registered query plans a CartesianProduct; BNLJ only where intended") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      df.collect() // finalize AQE so the audited plan is the executed one
      val plan = df.queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
        offenders += s"$name: unexpected BroadcastNestedLoopJoin"
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
