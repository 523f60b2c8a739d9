package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.text.CurationGates

/** The STREAMING face of [[graft.text.CurationPipeline]]: each
  * micro-batch passes the same stage-1 gates (the shared
  * [[CurationGates]] expressions, so batch and stream cannot drift) and
  * then near-dup ADMISSION against [[NearDupIngest]]'s persisted band
  * store — which subsumes exact dedup (identical documents carry
  * identical MinHash signatures, so the store vetoes them first).
  * Decontamination-at-ingest is [[BudgetIngest]]/`decontaminateAuto`
  * composition territory and deliberately not folded in here: benchmark
  * sets change independently of ingest, so production scrubs them on
  * READ paths (the batch pipeline) rather than baking a benchmark
  * snapshot into admission.
  *
  * Per-batch audit rows (n_input, n_gated, n_admitted,
  * n_rejected_near_dup) land in `storeDir/audit/batch_id=<id>/` —
  * batch-path-keyed overwrite, the VectorIngest drift-log posture.
  * Replay: [[NearDupIngest.applyBatch]]'s applied-marker makes admission
  * a no-op, and this wrapper checks the same marker BEFORE gating so a
  * replayed batch neither recomputes signals nor rewrites its audit row
  * with no-op zeros. A crash between the marker and the audit write
  * loses that batch's audit row (never corpus data) — the documented
  * marker-after-write window [[CorpusIngest]] carries too.
  */
object StreamingCuration {

  /** Apply one batch; returns (gated, admitted, rejectedNearDup).
    * Idempotent per batchId. */
  def applyBatch(batch: DataFrame, batchId: Long, corpusDir: String,
                 storeDir: String, k: Int = 8,
                 threshold: Double = 0.5): (Long, Long, Long) = {
    val spark = batch.sparkSession
    // marker resolved via Hadoop FS (StoreFs) so replay-idempotence
    // holds on non-local storeDirs too, not just file://
    if (StoreFs.exists(spark, s"$storeDir/_applied/batch-$batchId"))
      return (0L, 0L, 0L)
    val nIn = batch.count()
    // gates are row-local signal expressions — batch-sized work, and the
    // SAME expressions the batch pipeline filters on
    val gated = CurationGates.gate(batch).localCheckpoint()
    val nGated = gated.count()
    val (admitted, rejected) =
      NearDupIngest.applyBatch(gated, batchId, corpusDir, storeDir, k, threshold)
    import spark.implicits._
    Seq((nIn, nGated, admitted, rejected))
      .toDF("n_input", "n_gated", "n_admitted", "n_rejected_near_dup")
      .write.mode("overwrite").parquet(s"$storeDir/audit/batch_id=$batchId")
    (nGated, admitted, rejected)
  }

  /** Continuous curated ingest over a documents stream. */
  def ingestStream(source: DataFrame, corpusDir: String, storeDir: String,
                   checkpointDir: String): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b, id, corpusDir, storeDir); ()
      }
      .start()
}
