package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.text.{CurationGates, TextOps}

/** The STREAMING face of [[graft.text.CurationPipeline]]: each
  * micro-batch passes the same stage-1 gates (the shared
  * [[CurationGates]] expressions, so batch and stream cannot drift),
  * then stage 1.5 line-grain boilerplate removal against an ACCUMULATED
  * line-document-frequency store (one micro-batch alone cannot see
  * corpus-wide boilerplate), and then near-dup ADMISSION against
  * [[NearDupIngest]]'s persisted band store — which subsumes exact dedup
  * (identical documents carry identical MinHash signatures, so the store
  * vetoes them first). Decontamination-at-ingest is
  * [[BudgetIngest]]/`decontaminateAuto` composition territory and
  * deliberately not folded in here: benchmark sets change independently
  * of ingest, so production scrubs them on READ paths (the batch
  * pipeline) rather than baking a benchmark snapshot into admission.
  *
  * Line-stage semantics vs batch: [[graft.text.CurationPipeline]] counts
  * line document-frequency over its WHOLE input in one pass; the stream
  * decides at admission time against (stored df + this batch's df), so a
  * line is dropped from every document arriving AT or AFTER the batch
  * where its cumulative df crosses `lineMaxDocs` — documents admitted
  * earlier keep it (they were clean when admitted; rewriting history is
  * the batch pipeline's job on re-curation). Same threshold, same
  * [[TextOps.lineRemove]] rewrite, same drop-empty-doc +
  * recompute-n_chars rules as the batch stage. The df deltas land in
  * `storeDir/linedf/batch_id=<id>/` — batch-path-keyed OVERWRITE, so a
  * replay that died between the delta write and the applied-marker
  * rewrites the same partition instead of double-counting (the audit
  * rows' posture); the partitioning also gives natural compaction units
  * ([[graft.mars.Incremental.compact]] applies unchanged). Deltas are
  * counted from the GATED batch (the stage's actual input, the CCNet
  * posture of counting over the crawl before dedup), not from admitted
  * survivors — so a near-dup veto never hides boilerplate evidence.
  *
  * Per-batch audit rows (n_input, n_gated, n_line_touched,
  * n_dropped_empty, n_admitted, n_rejected_near_dup) land in
  * `storeDir/audit/batch_id=<id>/` — batch-path-keyed overwrite, the
  * VectorIngest drift-log posture. Schema note for stores that predate
  * the line stage: their early audit partitions carry only the original
  * four columns, so reads across an upgraded store's whole audit
  * directory must pass `mergeSchema=true` (plain reads infer from one
  * arbitrary footer; the two line-stage columns surface as NULL for old
  * batches, which is the honest value — the stage did not run). Replay: [[NearDupIngest.applyBatch]]'s
  * applied-marker makes admission a no-op, and this wrapper checks the
  * same marker BEFORE gating so a replayed batch neither recomputes
  * signals nor rewrites its audit row with no-op zeros. A crash between
  * the marker and the audit write loses that batch's audit row (never
  * corpus data) — the documented marker-after-write window
  * [[CorpusIngest]] carries too.
  */
object StreamingCuration {

  /** Apply one batch; returns (gated, admitted, rejectedNearDup).
    * Idempotent per batchId. */
  def applyBatch(batch: DataFrame, batchId: Long, corpusDir: String,
                 storeDir: String, k: Int = 8, threshold: Double = 0.5,
                 lineMaxDocs: Int = 3): (Long, Long, Long) = {
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

    // stage 1.5: cumulative line-df decides boilerplate; idempotent
    // delta write BEFORE the heavy set is read back, so this batch's own
    // lines participate in its threshold decision exactly once
    val lineDfDir = s"$storeDir/linedf"
    TextOps.lineHashCounts(gated)
      .write.mode("overwrite").parquet(s"$lineDfDir/batch_id=$batchId")
    val heavy = spark.read.parquet(lineDfDir)
      .groupBy("h").agg(sum("n_docs").as("n_docs"))
      .filter(col("n_docs") > lineMaxDocs).select("h")
    // the SAME rewrite+drop+recompute block the batch pipeline runs —
    // one helper, so admission-time and re-curation semantics cannot
    // drift (only the heavy-set derivation differs: cumulative df here,
    // single-pass df there)
    val lineDeduped =
      TextOps.applyLineRemoval(gated, heavy).localCheckpoint()
    val nLineTouched = lineDeduped.filter(col("n_removed") > 0).count()
    val nDroppedEmpty = nGated - lineDeduped.count()
    val cleaned = lineDeduped.select(batch.columns.map(col): _*)

    val (admitted, rejected) =
      NearDupIngest.applyBatch(cleaned, batchId, corpusDir, storeDir, k,
        threshold)
    import spark.implicits._
    Seq((nIn, nGated, nLineTouched, nDroppedEmpty, admitted, rejected))
      .toDF("n_input", "n_gated", "n_line_touched", "n_dropped_empty",
        "n_admitted", "n_rejected_near_dup")
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
