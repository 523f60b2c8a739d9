package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.mars.Incremental
import graft.ops.IncrementalAgg

/** Exactly-once streaming AGGREGATE mart: `foreachBatch` folds each
  * micro-batch's partials into a grouped mart published through the
  * versioned snapshot store, with the batch id inside the same atomic
  * commit as the data — [[SnapshotSink]]'s idempotent-writer contract
  * applied to [[IncrementalAgg]]'s combinable-partials contract.
  *
  * Why it composes: the mart is a key-grain table of algebraic partials
  * (count/sum/min/max), so folding a batch is `stored ∪ batch-partials →
  * re-reduce` — O(|batch| + |keys|), never a history re-read — and the
  * publish inherits the store's crash story: a version without its
  * commit marker is invisible to readers AND to the batch-id watermark,
  * so a replayed batch merges again to the same outcome; after the
  * marker it's skipped. The mart gains time travel for free — each
  * micro-batch is a queryable version ([[Incremental.readVersion]]).
  *
  * This is at-least-once-upgraded-to-exactly-once for the MART, which is
  * the piece [[IncrementalAgg.update]]'s plain directory swap cannot
  * give a restarting stream: replaying the last pre-crash batch into a
  * plain directory double-counts; here it is a no-op. */
object AggSink {

  /** Idempotently fold one micro-batch of RAW rows into the mart.
    * Returns false when this id was already committed.
    *
    * `kmvs`/`hists` maintain the two SKETCH partials
    * ([[graft.functions.KMinValues]] distinct sketches,
    * [[graft.functions.HistCells]] fixed-grid histogram cells) with the
    * same exactly-once contract as the algebraic columns — both are
    * insert-only mergeable, so folding a batch is the same
    * `stored ∪ batch-partials → re-reduce` shape, and a replayed batch
    * is a no-op via the batch-id-inside-commit watermark. This is the
    * streaming face of the two maintain-and-serve loops:
    * [[graft.plans.MvRewrite]] serves `kmin_values`/`hist_quantile`
    * reads from the mart this stream keeps fresh. */
  def applyBatch(batch: DataFrame, batchId: Long, target: String,
                 keys: Seq[String], sums: Seq[String] = Nil,
                 mins: Seq[String] = Nil, maxs: Seq[String] = Nil,
                 counts: Seq[String] = Nil,
                 kmvs: Seq[String] = Nil, kmvK: Int = 64,
                 hists: Seq[String] = Nil, histWidth: Int = 8,
                 hlls: Seq[String] = Nil, hllLgK: Int = 12): Boolean = {
    val spark = batch.sparkSession
    if (kmvs.nonEmpty || hists.nonEmpty)
      graft.functions.GraftFunctions.register(spark)
    if (batchId <= SnapshotSink.lastBatchId(spark, target)) false
    else {
      val p = IncrementalAgg.partials(batch, keys, sums, mins, maxs, counts,
        kmvs, kmvK, hists, histWidth, hlls, hllLgK)
      val merged =
        if (!Incremental.exists(spark, target)) p
        else IncrementalAgg.combine(
          Incremental.read(spark, target), p, keys, sums, mins, maxs, counts,
          kmvs, kmvK, hists, histWidth, hlls, hllLgK)
      Incremental.writeSnapshot(spark, target, merged, Nil,
        meta = Map(SnapshotSink.BatchIdKey -> batchId.toString))
      true
    }
  }

  /** Continuous aggregate maintenance: one committed mart version per
    * micro-batch. */
  def aggStream(source: DataFrame, target: String, keys: Seq[String],
                sums: Seq[String] = Nil, mins: Seq[String] = Nil,
                maxs: Seq[String] = Nil,
                checkpointDir: String,
                counts: Seq[String] = Nil,
                kmvs: Seq[String] = Nil, kmvK: Int = 64,
                hists: Seq[String] = Nil, histWidth: Int = 8,
                hlls: Seq[String] = Nil, hllLgK: Int = 12): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b, id, target, keys, sums, mins, maxs, counts,
          kmvs, kmvK, hists, histWidth, hlls, hllLgK); ()
      }
      .start()

  /** Read the maintained mart, deriving avg_X = sum_X / cnt_X when the
    * value-count partial is maintained, else sum_X / n_rows. */
  def read(spark: SparkSession, target: String,
           avgsOf: Seq[String] = Nil): DataFrame =
    avgsOf.foldLeft(Incremental.read(spark, target)) { (df, c) =>
      val denom = if (df.columns.contains(s"cnt_$c")) col(s"cnt_$c")
                  else col("n_rows")
      df.withColumn(s"avg_$c", col(s"sum_$c") / denom)
    }
}
