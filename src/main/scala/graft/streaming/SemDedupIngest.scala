package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sim.Embeddings

/** SEMANTIC near-dup ADMISSION over a vector stream — the
  * embedding-space sibling of [[NearDupIngest]] (r9): each micro-batch
  * routes its vectors to their nearest stored IVF centroid
  * ([[Embeddings.routeToIvfCells]] — the cell IS the blocking, so all
  * pair work below is Σ|cell|²-bounded exactly like the batch
  * [[Embeddings.semDedup]]), then a vector is REJECTED when any
  * already-admitted vector of the same cell — or an earlier-arriving
  * batch-mate routed to the same cell — sits at ≥ `threshold` cosine.
  * Earliest arrival wins, the same admission order [[NearDupIngest]]
  * uses for text (and the reason the stream face agrees with batch
  * min-id canonicals when batches arrive id-ordered; the batch
  * [[Embeddings.semDedup]] keeps the LEAST-centroid-typical member
  * instead — an intentional difference in survivor POLICY, not in what
  * counts as a duplicate, documented here rather than papered over).
  *
  * Cosines round to 6dp before the threshold test (the semDedup
  * convention), so admission decisions are engine- and replay-exact.
  *
  * Exactly-once by IDEMPOTENCE, [[VectorIngest]]'s posture: no marker —
  * a replayed batch re-derives every decision deterministically.
  * Admitted rows land in the postings via the vec_id∩cell anti-join, so
  * a replay appends nothing (or exactly a crash's missing remainder);
  * re-judging a replayed ADMITTED vector against the store would
  * self-veto at cosine 1.0, so the store probe excludes same-vec_id
  * matches, and batch-local pairs exclude self. A replayed REJECTED
  * vector re-rejects: its vetoing partner is either still in the batch
  * (batch-local pair re-fires) or was admitted and now sits in the
  * store (store probe fires).
  *
  * Scale shape per batch: one broadcast routing pass (|centroids|
  * rows), one cell-pruned postings scan (the [[VectorIngest.unseenOf]]
  * partition-filter trick — O(touched cells), not O(index)), one
  * batch×postings equi-join on cell and one batch self-join on cell,
  * both occupancy-bounded. Nothing collects but the touched-cell list
  * (centroid-bounded). */
object SemDedupIngest {

  /** Per-batch admission counters. `received` is the PRE-dedup batch
    * size; `droppedDupIds` counts same-batch repeated vec_ids removed
    * before any semantic judging (reported explicitly so callers summing
    * counters across batches account for every processed row — ADVICE
    * r9: the old (admitted, rejected) pair silently excluded them).
    * Invariant: received = droppedDupIds + admitted + rejected. */
  final case class BatchCounts(received: Long, droppedDupIds: Long,
                               admitted: Long, rejected: Long)

  /** Fold one (vec_id, embedding) micro-batch.
    *
    * Exact-copy collapse (VERDICT r10 #3 — the batch operator's
    * fifth-decade rewrite applied to the stream face): when
    * `threshold ≤ 1.0`, the batch is collapsed to ONE representative
    * per distinct embedding value (the min vec_id — earliest arrival,
    * the survivor policy this face already uses) before routing; every
    * non-representative copy is rejected WITHOUT being routed or
    * joined, because its own representative is an earlier-arriving
    * batch-mate at rounded cosine exactly 1.0 ≥ threshold — the
    * identical veto the uncollapsed self-join would fire. Identical
    * embeddings route to the identical cell and score identical
    * cosines, so representative decisions match the uncollapsed run's
    * (a copy that would veto a representative implies its own earlier
    * representative vetoes it too — the same rank argument as
    * [[Embeddings.semDedup]]'s collapse). This cuts the within-batch
    * pair work by multiplicity² and the routing pass by multiplicity —
    * the exact shape batch 0 of BENCH_SEMDEDUP_INGEST ships (20k rows
    * of replicas). With `threshold > 1.0` (nothing is ever a dup) the
    * collapse is skipped and the historical plan runs unchanged. */
  def applyBatch(batch: DataFrame, indexDir: String,
                 threshold: Double = 0.9): BatchCounts =
    applyBatchImpl(batch, indexDir, threshold,
      collapseExact = threshold <= 1.0)

  /** The A/B body behind [[applyBatch]]: `collapseExact = false` runs
    * the historical uncollapsed plan — kept callable (test-private) so
    * SemDedupIngestSpec pins collapsed ≡ uncollapsed admission
    * decisions on crafted multiplicity batches. */
  private[graft] def applyBatchImpl(batch: DataFrame, indexDir: String,
                                    threshold: Double,
                                    collapseExact: Boolean): BatchCounts = {
    val spark = batch.sparkSession
    require(new Path(s"$indexDir/centroids")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new Path(s"$indexDir/centroids")),
      s"no IVF index at $indexDir — build with Embeddings.buildIvfIndex")
    val nReceived = batch.count()
    val uniq = batch.dropDuplicates("vec_id")
    // the collapse: one representative (min vec_id) per distinct
    // embedding value; copies are vetoed by construction (see above)
    val judged =
      if (!collapseExact) uniq
      else uniq
        .withColumn("rep_id",
          min("vec_id").over(Window.partitionBy("embedding")))
        .filter(col("vec_id") === col("rep_id")).drop("rep_id")
    val routed = Embeddings.routeToIvfCells(spark, indexDir, judged).persist()
    try {
      val nUniq = if (collapseExact) uniq.count() else -1L
      val nTotal = routed.count()

      // batch-local: the LATER member of any same-cell pair at >= t is
      // vetoed (earliest arrival wins; a<b on vec_id = arrival order
      // within the batch, the NearDupIngest convention)
      val a = routed.select(col("cell"), col("vec_id").as("a_id"),
        col("emb").as("a_emb"), col("vnorm").as("a_norm"))
      val localVetoed = a.join(routed, Seq("cell"))
        .filter(col("a_id") < col("vec_id"))
        .filter(round(Embeddings.cosinePre(col("a_emb"), col("emb"),
          col("a_norm"), col("vnorm")), 6) >= threshold)
        .select("vec_id").distinct()
      val localSurvivors = routed.join(localVetoed, Seq("vec_id"), "left_anti")

      // store probe: any ADMITTED same-cell vector at >= t vetoes; the
      // postings scan partition-prunes to the batch's cells; same-vec_id
      // matches are excluded so a replayed admitted row never self-vetoes
      val postingsDir = s"$indexDir/postings"
      val fs = new Path(postingsDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val admitted =
        if (!fs.exists(new Path(postingsDir))) localSurvivors
        else {
          val cells = localSurvivors.select("cell").distinct()
            .collect().map(_.get(0))
          val stored = prunedPostings(spark, postingsDir, cells.toIndexedSeq)
            .select(col("cell"), col("vec_id").as("s_id"),
              col("emb").as("s_emb"), col("vnorm").as("s_norm"))
          val storeVetoed = localSurvivors.join(stored, Seq("cell"))
            .filter(col("vec_id") =!= col("s_id"))
            .filter(round(Embeddings.cosinePre(col("s_emb"), col("emb"),
              col("s_norm"), col("vnorm")), 6) >= threshold)
            .select("vec_id").distinct()
          localSurvivors.join(storeVetoed, Seq("vec_id"), "left_anti")
        }

      val toAppend = VectorIngest.unseenOf(admitted, indexDir)
        .localCheckpoint(true)
      val nAdmit = admitted.count()
      if (toAppend.count() > 0) Embeddings.appendRoutedToIvf(toAppend, indexDir)
      // under the collapse, non-representative copies were never routed:
      // they are REJECTED rows (their representative's cos-1.0 veto),
      // so the invariant received = droppedDupIds + admitted + rejected
      // holds over distinct vec_ids exactly as in the uncollapsed plan
      val nDistinct = if (collapseExact) nUniq else nTotal
      BatchCounts(nReceived, nReceived - nDistinct, nAdmit, nDistinct - nAdmit)
    } finally { routed.unpersist(); () }
  }

  /** The cell-pruned postings scan the store probe reads — the
    * [[VectorIngest.unseenOf]] partition-filter trick, factored out so
    * its scale claim is PLAN-ASSERTED (SemDedupIngestSpec): `cell` is
    * the postings' partition column, so the isin lands in the scan's
    * PartitionFilters and the probe lists/reads O(touched cells)
    * partition directories — never the index. */
  private[graft] def prunedPostings(spark: org.apache.spark.sql.SparkSession,
                                    postingsDir: String,
                                    cells: Seq[Any]): DataFrame =
    spark.read.parquet(postingsDir)
      .filter(col("cell").isin(cells: _*))

  /** Continuous semantic-deduped ingest over a (vec_id, embedding)
    * stream. */
  def ingestStream(source: DataFrame, indexDir: String,
                   checkpointDir: String,
                   threshold: Double = 0.9): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, _: Long) =>
        applyBatch(b, indexDir, threshold); ()
      }
      .start()
}
