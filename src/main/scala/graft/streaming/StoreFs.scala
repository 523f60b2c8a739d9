package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Store-path filesystem resolution for the streaming ingest faces
  * (CorpusIngest / NearDupIngest / StreamingCuration). Markers and store
  * probes resolve through Hadoop's FileSystem from the session's
  * hadoopConfiguration — the same posture [[graft.ops.IncrementalAgg]]
  * and [[graft.mars.Incremental]] take — so replay-idempotence holds on
  * ANY storage scheme (HDFS/S3/local), not just the local filesystem a
  * `java.io.File` check silently restricts to: with a bare File path, a
  * replayed batch on hdfs:// never sees its applied-marker and re-runs
  * gating and admission every time.
  */
private[streaming] object StoreFs {

  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    fs(spark, path).exists(p)
  }

  /** Create an empty marker file (parents included), via
    * [[graft.mars.Incremental.createExclusive]] — the ONE
    * scheme-dispatched atomic-create primitive (local
    * `java.io.File.createNewFile` where Hadoop's RawLocalFileSystem
    * lacks O_EXCL; `create(overwrite = false)` elsewhere). A lost race
    * (marker already present) is a no-op, not an error, because a
    * marker is idempotent evidence, not a claim. */
  def touch(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val q = f.makeQualified(new Path(path))
    f.mkdirs(q.getParent)
    graft.mars.Incremental.createExclusive(f, q)
    ()
  }
}
