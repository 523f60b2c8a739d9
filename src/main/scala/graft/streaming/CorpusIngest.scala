package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.text.TextOps

/** Continuous corpus ingestion: a document stream deduplicated against a
  * PERSISTED fingerprint store, so the corpus only ever grows by novel
  * content — the streaming face of the batch dedup family.
  *
  * Per micro-batch (foreachBatch):
  *   1. exact-hash fingerprint each incoming doc (md5 of text — the same
  *      `doc_hash` the batch pipeline uses),
  *   2. dedup within the batch (keep lowest doc_id per hash — arrival
  *      determinism),
  *   3. anti-join against the store parquet: hashes are 8-byte longs, so
  *      the join ships fingerprints, never documents; at scale the store
  *      side is bucketed by hash and the join stays co-located,
  *   4. append novel docs to the corpus sink and their hashes to the store.
  *
  * Replay safety: foreachBatch re-delivers a batch after failure, and a
  * blind append would duplicate. Each applied batch writes a
  * `_applied/batch-<id>` marker AFTER its appends; a replayed id is a
  * no-op. (The marker-after-write ordering means a crash between append
  * and marker can duplicate into the CORPUS sink on replay — but never
  * past the store anti-join into LATER batches; the corpus sink is
  * downstream-deduped by the same hash on read. This is the standard
  * at-least-once sink + idempotent-reader contract; an atomic-commit sink
  * like Delta would close the gap.)
  */
object CorpusIngest {

  /** Apply one batch; returns (novelCount, seenCount). Idempotent per
    * batchId. */
  def applyBatch(batch: DataFrame, batchId: Long,
                 corpusDir: String, storeDir: String): (Long, Long) = {
    val spark = batch.sparkSession
    val marker = s"$storeDir/_applied/batch-$batchId"
    if (StoreFs.exists(spark, marker)) return (0L, 0L)

    val hashed = batch
      .withColumn("doc_hash", TextOps.md5Long(col("text")))
    // within-batch dedup: lowest doc_id wins per hash
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_hash").orderBy("doc_id")
    val batchUnique = hashed
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")

    val storePath = s"$storeDir/fingerprints"
    val novel =
      if (StoreFs.exists(spark, storePath)) {
        val seen = spark.read.parquet(storePath)
        batchUnique.join(seen, Seq("doc_hash"), "left_anti")
      } else batchUnique
    val novelCached = novel.localCheckpoint(true)
    val n = novelCached.count()
    val total = batchUnique.count()

    if (n > 0) {
      novelCached.drop("doc_hash")
        .write.mode(SaveMode.Append).parquet(s"$corpusDir/documents")
      novelCached.select("doc_hash")
        .write.mode(SaveMode.Append).parquet(storePath)
    }
    StoreFs.touch(spark, marker)
    (n, total - n)
  }

  /** Wire a streaming document source into the deduped corpus. */
  def stream(docs: DataFrame, corpusDir: String, storeDir: String,
             checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b, id, corpusDir, storeDir); ()
      }
      .start()
}
