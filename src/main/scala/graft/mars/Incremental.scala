package graft.mars

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** dbt incremental materialization semantics over parquet table paths
  * (SURVEY §2.9). Three behaviors:
  *
  *  - append + high-watermark: filter source rows newer than
  *    MAX(watermarkCol) in the target, append (reference:
  *    flat_photo_response.sql:27-29 and all mart models). unique_key is
  *    declared by the reference but append does NOT dedup — preserved.
  *  - merge + unique_key: upsert — replace matching keys, insert new
  *    (reference: flat_manifest_response et al). No Delta in this
  *    environment, so: old ANTI-JOIN new ∪ new, written as an immutable
  *    VERSIONED SNAPSHOT (`vNNNNNNNN/`) under the table root, published
  *    by atomically flipping a `_current` pointer file (SURVEY §7.4.1).
  *    The r2 temp-dir-swap had a window where a concurrent reader saw a
  *    half-swapped table; with snapshots a reader resolves the pointer
  *    once at DataFrame creation and then reads an immutable directory —
  *    a racing merge can never tear it. Old snapshots are retained until
  *    an explicit [[vacuum]] (the reader-grace contract, as in Delta).
  *  - view: just a lazy DataFrame; nothing to do here.
  *
  * Scale: at 100 TB the merge rewrite is the expensive path; the anti-join
  * shuffles on the key unless the table is bucketed by it. The reference's
  * merge tables are rover- and (rover,sol)-grain — small — while the truly
  * big table (flat_photo_response) is append-only, which is why this
  * read-modify-write design holds up. cluster_by is reproduced with
  * repartition + sortWithinPartitions so parquet row-group stats give
  * min/max pruning on the cluster keys.
  */
object Incremental {

  /** Pointer file naming the live snapshot dir; its presence marks a
    * versioned (merge-managed) table root. */
  private val CurrentPointer = "_current"

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A table exists when it has a published snapshot pointer (versioned
    * layout) or direct data files (flat/append layout). A root holding
    * only an unpublished snapshot dir — a writer crashed before the
    * pointer flip — is NOT a table yet: the crashed write is invisible,
    * which is exactly the atomicity contract. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val f = fs(spark, path)
    f.exists(p) && {
      f.exists(new Path(p, CurrentPointer)) ||
        f.listStatus(p).exists(st =>
          st.isFile && !st.getPath.getName.startsWith("_"))
    }
  }

  /** The live snapshot dir name, when `path` is a versioned root. */
  def currentSnapshot(spark: SparkSession, path: String): Option[String] = {
    val ptr = new Path(path, CurrentPointer)
    val f = fs(spark, path)
    if (!f.exists(ptr)) None
    else {
      val in = f.open(ptr)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        Some(new String(buf.toByteArray, UTF_8).trim)
      } finally in.close()
    }
  }

  /** Resolves the pointer ONCE, eagerly: the returned DataFrame is bound
    * to an immutable snapshot directory, so lazy evaluation later — even
    * mid-merge — reads a consistent table. Flat (append-layout) paths
    * read directly. */
  def read(spark: SparkSession, path: String): DataFrame =
    currentSnapshot(spark, path) match {
      case Some(snap) => spark.read.parquet(s"$path/$snap")
      case None       => spark.read.parquet(path)
    }

  /** ISO-8601-string high-watermark filter (P3/A4): rows strictly newer
    * than the target's MAX(watermarkCol). String `>` is correct for ISO
    * timestamps (SURVEY §7.4.5). */
  def newerThanWatermark(spark: SparkSession, target: String, source: DataFrame,
                         watermarkCol: String): DataFrame =
    if (!exists(spark, target)) source
    else {
      val wm = read(spark, target).agg(max(col(watermarkCol))).first().getString(0)
      if (wm == null) source else source.filter(col(watermarkCol) > lit(wm))
    }

  /** incremental_strategy='append' with watermark filter. */
  def appendIncremental(spark: SparkSession, target: String, source: DataFrame,
                        watermarkCol: String = "ingestion_date",
                        clusterBy: Seq[String] = Nil): Unit = {
    val fresh = newerThanWatermark(spark, target, source, watermarkCol)
    write(fresh, target, SaveMode.Append, clusterBy)
  }

  /** incremental_strategy='merge' with unique_key: upsert via anti-join +
    * union, published as a fresh immutable snapshot (see writeSnapshot).
    * Also applies the watermark filter to the incoming side first, like
    * dbt's is_incremental() guard. */
  def mergeIncremental(spark: SparkSession, target: String, source: DataFrame,
                       keys: Seq[String], watermarkCol: String = "ingestion_date",
                       clusterBy: Seq[String] = Nil): Unit = {
    if (!exists(spark, target)) {
      writeSnapshot(spark, target, source, clusterBy)
      return
    }
    val fresh = newerThanWatermark(spark, target, source, watermarkCol)
    val old = read(spark, target)
    val kept = old.join(fresh.select(keys.map(col): _*).distinct(), keys, "left_anti")
    val merged = kept.unionByName(fresh.select(old.columns.map(col).toIndexedSeq: _*))
    writeSnapshot(spark, target, merged, clusterBy)
  }

  /** Write `df` as the next `vNNNNNNNN/` snapshot under `root`, then
    * publish it by atomically replacing the `_current` pointer
    * (write-to-temp + FileContext rename with OVERWRITE — atomic on posix
    * and HDFS). Readers either resolve the old pointer or the new one;
    * there is no in-between state, and the directory a reader resolved is
    * never mutated afterwards. A crash before the flip leaves an orphan
    * snapshot dir that [[exists]] ignores and [[vacuum]] removes. */
  private def writeSnapshot(spark: SparkSession, root: String, df: DataFrame,
                            clusterBy: Seq[String]): Unit = {
    val next = currentSnapshot(spark, root) match {
      case Some(snap) => snap.stripPrefix("v").toInt + 1
      case None       => 1
    }
    val snap = f"v$next%08d"
    write(df, s"$root/$snap", SaveMode.Overwrite, clusterBy)

    val conf = spark.sparkContext.hadoopConfiguration
    val rootPath = new Path(root)
    val fc = FileContext.getFileContext(
      fs(spark, root).makeQualified(rootPath).toUri, conf)
    val tmp = new Path(rootPath, s"$CurrentPointer.tmp")
    val out = fc.create(tmp,
      java.util.EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE))
    try out.write(snap.getBytes(UTF_8)) finally out.close()
    fc.rename(tmp, new Path(rootPath, CurrentPointer), Options.Rename.OVERWRITE)
  }

  /** All snapshot dir names under a versioned root, oldest first —
    * including any orphaned (never-published) write. */
  def snapshots(spark: SparkSession, root: String): Seq[String] = {
    val f = fs(spark, root)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) Nil
    else f.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d{8}"))
      .map(_.getPath.getName).sorted
  }

  /** Time-travel read: a specific retained snapshot version (1-based, as
    * in the dir name). Only PUBLISHED versions are readable — an orphaned
    * dir from a crashed write, or one newer than `_current`, is not a
    * committed version and is refused. */
  def readVersion(spark: SparkSession, root: String, version: Int): DataFrame = {
    val snap = f"v$version%08d"
    val current = currentSnapshot(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root is not a versioned table"))
    require(snap <= current, s"version $version was never published (current $current)")
    require(snapshots(spark, root).contains(snap),
      s"version $version not retained (vacuumed?)")
    spark.read.parquet(s"$root/$snap")
  }

  /** Drop all snapshots except the `keep` newest (and any orphaned
    * pointer temp). Retention is the reader-grace contract: a reader that
    * resolved a snapshot keeps reading it safely until vacuum removes
    * dirs older than its grace window — identical to Delta's VACUUM
    * semantics. */
  def vacuum(spark: SparkSession, root: String, keep: Int = 2): Unit = {
    val f = fs(spark, root)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) return
    val current = currentSnapshot(spark, root)
    val snaps = f.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d{8}"))
      .map(_.getPath.getName).sorted
    val doomed = snaps.dropRight(keep).filterNot(current.contains)
    doomed.foreach(s => f.delete(new Path(rootPath, s), true))
  }

  /** dbt cluster_by → repartition on the first key + sort within
    * partitions on all of them: co-locates key ranges so parquet row-group
    * min/max stats prune on the cluster keys (SURVEY §2.9). */
  private def write(df: DataFrame, path: String, mode: SaveMode,
                    clusterBy: Seq[String]): Unit = {
    val arranged =
      if (clusterBy.isEmpty) df
      else df.repartition(col(clusterBy.head))
        .sortWithinPartitions(clusterBy.map(col): _*)
    arranged.write.mode(mode).parquet(path)
  }
}
