package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental AGGREGATE maintenance: keep a grouped mart current by
  * combining stored partial aggregates with each new batch's partials —
  * history is never recomputed and never re-read beyond the (key-grain,
  * small) partial table. This is the step past graft.mars.Incremental's
  * row-level append/merge: dbt users hand-roll exactly this pattern for
  * incremental aggregate models.
  *
  * Only COMBINABLE aggregates are stored (count/sum/min/max — algebraic
  * partials that merge associatively); averages are derived as sum/count
  * at read time via [[withAverages]]. That restriction is what makes the
  * update O(|batch| + |keys|) instead of O(|history|): the combine is
  * `stored ∪ batch-partials → groupBy(keys) → re-reduce`, a shuffle of
  * two key-grain tables. Updates go to a temp path and swap (never
  * overwrite a path being read).
  */
object IncrementalAgg {

  private def partials(batch: DataFrame, keys: Seq[String], sums: Seq[String],
                       mins: Seq[String], maxs: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      (sums.map(c => sum(col(c)).as(s"sum_$c")) ++
        mins.map(c => min(col(c)).as(s"min_$c")) ++
        maxs.map(c => max(col(c)).as(s"max_$c")))
    batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def combine(a: DataFrame, b: DataFrame, keys: Seq[String],
                      sums: Seq[String], mins: Seq[String],
                      maxs: Seq[String]): DataFrame = {
    val aggs = sum(col("n_rows")).as("n_rows") +:
      (sums.map(c => sum(col(s"sum_$c")).as(s"sum_$c")) ++
        mins.map(c => min(col(s"min_$c")).as(s"min_$c")) ++
        maxs.map(c => max(col(s"max_$c")).as(s"max_$c")))
    a.unionByName(b).groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold one batch into the stored partial-aggregate table. */
  def update(spark: SparkSession, storeDir: String, batch: DataFrame,
             keys: Seq[String], sums: Seq[String] = Nil,
             mins: Seq[String] = Nil, maxs: Seq[String] = Nil): Unit = {
    val p = partials(batch, keys, sums, mins, maxs)
    val path = new Path(storeDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) {
      p.write.mode(SaveMode.Overwrite).parquet(storeDir)
    } else {
      val merged = combine(spark.read.parquet(storeDir), p, keys, sums, mins, maxs)
      val tmp = storeDir + ".tmp_swap"
      merged.write.mode(SaveMode.Overwrite).parquet(tmp)
      fs.delete(path, true)
      fs.rename(new Path(tmp), path)
    }
  }

  /** Read the maintained mart, deriving avg_X = sum_X / n_rows. */
  def read(spark: SparkSession, storeDir: String,
           avgsOf: Seq[String] = Nil): DataFrame = {
    val base = spark.read.parquet(storeDir)
    avgsOf.foldLeft(base) { (df, c) =>
      df.withColumn(s"avg_$c", col(s"sum_$c") / col("n_rows"))
    }
  }
}
