package graft.mars

import org.apache.hadoop.fs.Path
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
  *    environment, so: old ANTI-JOIN new ∪ new, written to a temp path
  *    then atomically swapped (never overwrite a path being read —
  *    SURVEY §7.4.1).
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

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

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
    * union + temp-path swap. Also applies the watermark filter to the
    * incoming side first, like dbt's is_incremental() guard. */
  def mergeIncremental(spark: SparkSession, target: String, source: DataFrame,
                       keys: Seq[String], watermarkCol: String = "ingestion_date",
                       clusterBy: Seq[String] = Nil): Unit = {
    if (!exists(spark, target)) {
      write(source, target, SaveMode.Overwrite, clusterBy)
      return
    }
    val fresh = newerThanWatermark(spark, target, source, watermarkCol)
    val old = read(spark, target)
    val kept = old.join(fresh.select(keys.map(col): _*).distinct(), keys, "left_anti")
    val merged = kept.unionByName(fresh.select(old.columns.map(col).toIndexedSeq: _*))

    // temp-path swap: never overwrite a path we are still lazily reading
    val tmp = target + ".tmp_swap"
    write(merged, tmp, SaveMode.Overwrite, clusterBy)
    val fs = new Path(target).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(target), true)
    fs.rename(new Path(tmp), new Path(target))
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
