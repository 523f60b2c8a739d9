package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sim.Embeddings

/** Streaming maintenance of the persisted IVF index: each micro-batch
  * routes its vectors to their nearest existing centroid and appends
  * those postings partitions — [[Embeddings.appendToIvfIndex]] made safe
  * for a restarting stream.
  *
  * Exactly-once by IDEMPOTENCE, not by a transaction: plain parquet
  * `append` cannot commit a batch-id marker atomically with data (that
  * is the versioned store's trick, [[SnapshotSink]]), so instead every
  * batch anti-joins the postings on `vec_id` before appending — an
  * 8-byte-column scan of the index, partition-prunable at scale. A
  * replayed batch finds all its ids present and appends nothing; a crash
  * MID-append leaves a partial batch whose replay appends exactly the
  * missing remainder. Both converge to one posting per vector. Contract:
  * `vec_id` is unique upstream (the vector lake's natural key).
  *
  * Centroid drift is the batch path's problem ([[Embeddings.kmeansAssign]]
  * + rebuild when it accumulates); the stream only ever routes into
  * existing cells, which is what keeps the append partition-local. */
object VectorIngest {

  /** Idempotently fold one micro-batch of (vec_id, embedding) rows. */
  def applyBatch(batch: DataFrame, indexDir: String): Unit = {
    val spark = batch.sparkSession
    val postingsDir = s"$indexDir/postings"
    val fs = new Path(indexDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(s"$indexDir/centroids")),
      s"no IVF index at $indexDir — build with Embeddings.buildIvfIndex")
    val deduped = batch.dropDuplicates("vec_id")
    val unseen =
      if (!fs.exists(new Path(postingsDir))) deduped
      else deduped.join(
        spark.read.parquet(postingsDir).select(col("vec_id")),
        Seq("vec_id"), "left_anti")
    Embeddings.appendToIvfIndex(spark, indexDir, unseen)
  }

  /** Continuous ingest: `foreachBatch` over a (vec_id, embedding) stream. */
  def ingestStream(source: DataFrame, indexDir: String,
                   checkpointDir: String): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, _: Long) =>
        applyBatch(b, indexDir); ()
      }
      .start()
}
