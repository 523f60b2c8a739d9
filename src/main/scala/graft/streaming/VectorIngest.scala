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
    val fs = new Path(indexDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(s"$indexDir/centroids")),
      s"no IVF index at $indexDir — build with Embeddings.buildIvfIndex")
    // persist the routed batch: it is read twice (the cell-list collect in
    // unseenOf, then the anti-join) and routing is the batch's one
    // crossJoin — recomputing it would double the micro-batch's work.
    val routed = Embeddings.routeToIvfCells(spark, indexDir,
      batch.dropDuplicates("vec_id")).persist()
    try {
      Embeddings.appendRoutedToIvf(unseenOf(routed, indexDir), indexDir)
    } finally { routed.unpersist(); () }
  }

  /** The routed batch rows not yet in the index, write-ready.
    *
    * The dedup anti-join is CELL-SCOPED: the postings side is filtered to
    * `cell IN (batch's cells)` — a static partition filter, so the scan
    * reads only the partitions this batch can possibly collide with
    * instead of the whole index. Sound because routing is deterministic
    * under a fixed centroid table ([[Embeddings.routeToIvfCells]]): a
    * vec_id already present sits in exactly the cell the replay routes it
    * to (a centroid rebuild rewrites the postings wholesale, so stale
    * placements cannot survive one). At 100 TB this turns the per-batch
    * dedup read from O(index) into O(touched cells). The collected cell
    * list is bounded by the centroid count — a driver-side scalar, not
    * data volume. */
  private[graft] def unseenOf(routed: DataFrame, indexDir: String): DataFrame = {
    val spark = routed.sparkSession
    val postingsDir = s"$indexDir/postings"
    val fs = new Path(postingsDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(postingsDir))) routed
    else {
      val cells = routed.select("cell").distinct().collect().map(_.get(0))
      routed.join(
        spark.read.parquet(postingsDir)
          .filter(col("cell").isin(cells.toIndexedSeq: _*))
          .select(col("vec_id"), col("cell")),
        Seq("vec_id", "cell"), "left_anti")
    }
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
