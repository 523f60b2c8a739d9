package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * rows' posture). Deltas are counted from the GATED batch (the stage's
  * actual input, the CCNet posture of counting over the crawl before
  * dedup), not from admitted survivors — so a near-dup veto never hides
  * boilerplate evidence.
  *
  * Line-df maintenance is O(batch + keys), never O(history) — the
  * [[graft.ops.IncrementalAgg]] contract, closing r6's one streaming
  * scale gap (the per-batch re-read of EVERY delta partition grew with
  * corpus lifetime): each batch's (h, n_docs) delta folds into a
  * VERSIONED cumulative snapshot `storeDir/linedf_snap/v=<batchId>` =
  * (previous version ∪ delta) re-summed — a shuffle of two key-grain
  * tables — and the heavy set is derived from that ONE snapshot
  * version. Versioning gives replay determinism for free: a batch
  * always folds onto the latest version STRICTLY BELOW its own id, so
  * a crash between the snapshot write and the applied-marker replays
  * to a byte-identical v=<batchId> instead of double-counting.
  * `keepVersions` (default 2: current + fallback) bounds the snapshot
  * directory, and delta partitions older than the oldest kept version
  * are pruned with it — they are subsumed by the fold — so the store
  * no longer grows a partition per batch forever. A store that
  * predates the snapshot upgrades itself on its first post-upgrade
  * batch: with no snapshot present, the whole legacy delta directory
  * collapses into the first version (one O(history) fold, once).
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

  /** Partition-style child names (`prefix<id>`) under `dir`, sorted. */
  private def childIds(spark: SparkSession, dir: String,
                       prefix: String): Seq[Long] = {
    val f = StoreFs.fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .flatMap(n => scala.util.Try(n.stripPrefix(prefix).toLong).toOption)
      .sorted
  }

  /** Apply one batch; returns (gated, admitted, rejectedNearDup).
    * Idempotent per batchId. */
  def applyBatch(batch: DataFrame, batchId: Long, corpusDir: String,
                 storeDir: String, k: Int = 8, threshold: Double = 0.5,
                 lineMaxDocs: Int = 3, keepVersions: Int = 2): (Long, Long, Long) = {
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
    // delta write BEFORE the fold, so this batch's own lines
    // participate in its threshold decision exactly once
    val lineDfDir = s"$storeDir/linedf"
    val snapDir = s"$storeDir/linedf_snap"
    TextOps.lineHashCounts(gated)
      .write.mode("overwrite").parquet(s"$lineDfDir/batch_id=$batchId")
    // fold delta → versioned cumulative snapshot: O(batch + keys) per
    // batch, and the heavy set below reads ONE version — never the
    // ever-growing delta directory. prev is the latest version
    // STRICTLY below this batch id, so a replay (marker lost between
    // snapshot write and marker touch) re-derives v=<batchId>
    // byte-identically instead of folding onto its own partial result
    val prevVersions = childIds(spark, snapDir, "v=").filter(_ < batchId)
    val cumulative = prevVersions.lastOption match {
      case Some(v) =>
        spark.read.parquet(s"$snapDir/v=$v")
          .unionByName(spark.read.parquet(s"$lineDfDir/batch_id=$batchId"))
          .groupBy("h").agg(sum("n_docs").as("n_docs"))
      case None =>
        // first fold — also the one-time upgrade for pre-snapshot
        // stores: every legacy delta partition (this batch's included)
        // collapses into the first version
        spark.read.parquet(lineDfDir)
          .groupBy("h").agg(sum("n_docs").as("n_docs"))
    }
    cumulative.write.mode("overwrite").parquet(s"$snapDir/v=$batchId")
    val heavy = spark.read.parquet(s"$snapDir/v=$batchId")
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

    // retention: the snapshot fold subsumes every delta at-or-below its
    // version, so the store stays BOUNDED — keep the newest
    // `keepVersions` snapshots (current + replay fallback) and prune
    // every older delta: a replay always REWRITES its own delta and
    // folds onto the prior snapshot, so no delta is ever read again
    // after its batch's snapshot exists (the legacy-upgrade whole-dir
    // read only happens while no snapshot exists, before any pruning).
    // Pruning runs last (after the audit write): a crash anywhere above
    // replays against intact state
    val f = StoreFs.fs(spark, storeDir)
    val kept = (prevVersions.takeRight(math.max(1, keepVersions) - 1)
      :+ batchId).toSet
    // only versions BELOW this batch are prunable — never touch newer
    // state (a late replay against a manually cleared marker must not
    // take down snapshots the batches after it already folded onto)
    childIds(spark, snapDir, "v=")
      .filter(v => v < batchId && !kept.contains(v))
      .foreach(v => f.delete(new Path(s"$snapDir/v=$v"), true))
    childIds(spark, lineDfDir, "batch_id=").filter(_ < batchId)
      .foreach(b => f.delete(new Path(s"$lineDfDir/batch_id=$b"), true))
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
