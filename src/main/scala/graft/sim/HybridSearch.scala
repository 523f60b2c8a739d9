package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Hybrid retrieval: a keyword rank list and a vector rank list fused by
  * Reciprocal Rank Fusion (Cormack et al., SIGIR'09) —
  * `rrf(d) = Σ_lists 1/(k + rank_list(d))`, the standard score-free
  * fusion used when lexical and embedding retrieval must be combined
  * without calibrating their score scales against each other.
  *
  * Scale shape: both legs produce top-k-per-query frames (queries × k
  * rows — tiny regardless of corpus size), so the fusion join is
  * negligible; all the weight is in the legs, each of which keeps the
  * corpus unshuffled until candidates are bounded (keyword: broadcast
  * query-term probe; vector: [[Embeddings.knnBruteForce]] or any ANN leg
  * — RRF only consumes (query_id, doc_id, rank)).
  */
object HybridSearch {

  /** Keyword leg: rank corpus documents per query document by the count
    * of shared DISTINCT tokens — the relational inverted-index probe.
    * The query side (queries × their distinct terms) is broadcast; the
    * corpus explodes its distinct tokens into the probe join, so only
    * term-matched rows reach the (query, doc) aggregation. Integer
    * overlap counts → rank order is engine-exact. */
  def keywordTopK(docs: DataFrame, queryFilter: Column, k: Int = 20): DataFrame = {
    val dt = TextOps.tokenized(docs)
      .select(col("doc_id"), array_distinct(col("toks")).as("dt"))
    val q = dt.filter(queryFilter)
      .select(col("doc_id").as("query_id"), explode(col("dt")).as("term"))
    val overlap = dt.select(col("doc_id"), explode(col("dt")).as("term"))
      .join(broadcast(q), "term")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("overlap"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("overlap").desc, col("doc_id").asc)
    overlap.withColumn("kw_rank", row_number().over(w))
      .filter(col("kw_rank") <= k)
      .select("query_id", "doc_id", "overlap", "kw_rank")
  }

  /** RRF fusion of the two legs. Docs surfaced by only one leg keep a
    * null rank on the other and contribute a single reciprocal term —
    * the full-outer join IS the standard RRF union-of-lists semantics.
    * `1/(k+rank)` on integer ranks is a single fixed-shape float
    * expression (no aggregation), so fused scores are bit-stable. */
  def rrfFuse(kw: DataFrame, vec: DataFrame,
              kRrf: Int = 60, topK: Int = 10): DataFrame = {
    val fused = kw.select(col("query_id"), col("doc_id"), col("kw_rank"))
      .join(
        vec.select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("knn_rank").as("vec_rank")),
        Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(kRrf) + col("kw_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("vec_rank")), lit(0.0)), 6))
    // top-k boundary pinned on the ROUNDED score, ties to doc_id — the
    // same contract as every ranked query in the engine
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("doc_id").asc)
    fused.withColumn("fused_rank", row_number().over(w))
      .filter(col("fused_rank") <= topK)
      .select("query_id", "doc_id", "rrf", "kw_rank", "vec_rank", "fused_rank")
  }
}
