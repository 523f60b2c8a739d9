package graft.streaming

import org.apache.hadoop.fs.{FileAlreadyExistsException, FileSystem, Path}
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

  /** Create an empty marker file (parents included). Local paths go
    * through `java.io.File.createNewFile` — documented atomic, where
    * Hadoop's RawLocalFileSystem createNewFile is exists-then-create —
    * mirroring [[graft.mars.Incremental]]'s exclusive-create primitive;
    * a lost race (marker already present) is a no-op, not an error,
    * because a marker is idempotent evidence, not a claim. */
  def touch(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val q = f.makeQualified(new Path(path))
    f.mkdirs(q.getParent)
    if (q.toUri.getScheme == "file")
      new java.io.File(q.toUri.getPath).createNewFile()
    else
      try f.create(q, false).close()
      catch { case _: FileAlreadyExistsException => () }
  }
}
