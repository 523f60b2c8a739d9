package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.mars.Incremental

/** Exactly-once streaming upsert into a versioned snapshot table —
  * `foreachBatch` → [[Incremental.mergeIncremental]] / [[Incremental.scd2Merge]]
  * with the micro-batch id recorded INSIDE the published version.
  *
  * Why this is exactly-once where [[CorpusIngest]] is honestly
  * at-least-once: there, the applied-batch marker is a separate file
  * written AFTER the data append, so a crash between the two duplicates
  * on replay. Here the batch id travels in the snapshot dir itself and
  * becomes visible in the same atomic commit-marker publish as the data
  * (the Delta `txnAppId`/`txnVersion` idempotent-writer pattern):
  *
  *  - crash BEFORE the commit marker → the version is invisible, the
  *    replayed batch merges again, one outcome;
  *  - crash AFTER the commit marker → the replayed id is ≤ the recorded
  *    watermark, the batch is skipped, one outcome.
  *
  * The skip test is `batchId <= max(recorded)` — valid because
  * foreachBatch ids are strictly increasing per checkpoint and only the
  * newest batch can be re-delivered. The watermark survives [[Incremental.vacuum]]
  * (the newest version is never deleted, and later versions carry later
  * ids) and [[Incremental.compact]] (which carries metadata forward). A
  * NEW checkpoint restarts ids at 0, so — as with any txnVersion sink —
  * a fresh checkpoint needs a fresh table (or a changed [[BatchIdKey]]).
  *
  * Scale: the merge cost per micro-batch is the snapshot-store contract
  * (anti-join + rewrite, suited to dimension/state-grain tables); the
  * exactly-once machinery adds two metadata file reads per batch and
  * nothing per-row.
  */
object SnapshotSink {

  val BatchIdKey = "streaming.batchId"

  /** Highest batch id recorded across committed versions (−1 when none).
    * The max over the retained chain — not just the current version — so
    * an interleaved non-streaming merge (which records no id) cannot
    * roll the watermark backwards. */
  def lastBatchId(spark: SparkSession, target: String): Long =
    Incremental.snapshots(spark, target)
      .flatMap(s => Incremental.snapshotMeta(spark, target,
        Some(s.stripPrefix("v").toInt)).get(BatchIdKey))
      .map(_.toLong).foldLeft(-1L)(math.max)

  /** Idempotently fold one micro-batch into the table. Returns true when
    * the batch was applied, false when its id was already folded. */
  def applyUpsert(batch: DataFrame, batchId: Long, target: String,
                  keys: Seq[String], watermarkCol: String,
                  clusterBy: Seq[String] = Nil): Boolean = {
    val spark = batch.sparkSession
    if (batchId <= lastBatchId(spark, target)) false
    else {
      Incremental.mergeIncremental(spark, target, batch, keys, watermarkCol,
        clusterBy, meta = Map(BatchIdKey -> batchId.toString))
      true
    }
  }

  /** The SCD2 face: fold a micro-batch of change events into a type-2
    * history table, same idempotence contract. */
  def applyScd2(batch: DataFrame, batchId: Long, target: String,
                keys: Seq[String], updatedAt: String,
                checkCols: Seq[String]): Boolean = {
    val spark = batch.sparkSession
    if (batchId <= lastBatchId(spark, target)) false
    else {
      Incremental.scd2Merge(spark, target, batch, keys, updatedAt, checkCols,
        meta = Map(BatchIdKey -> batchId.toString))
      true
    }
  }

  /** Continuous upsert: every micro-batch becomes one committed version. */
  def upsertStream(source: DataFrame, target: String, keys: Seq[String],
                   watermarkCol: String, checkpointDir: String): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyUpsert(b, id, target, keys, watermarkCol); ()
      }
      .start()

  /** Continuous SCD2: a change stream maintains the full type-2 history —
    * the streaming face of the dbt `snapshot` materialization. */
  def scd2Stream(source: DataFrame, target: String, keys: Seq[String],
                 updatedAt: String, checkCols: Seq[String],
                 checkpointDir: String): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyScd2(b, id, target, keys, updatedAt, checkCols); ()
      }
      .start()
}
