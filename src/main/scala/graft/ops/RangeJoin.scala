package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join via bucketization.
  *
  * Spark plans a bare `p BETWEEN lo AND hi` join as
  * BroadcastNestedLoopJoin (or worse, a cartesian product) — |points| ×
  * |intervals| comparisons. Bucketizing turns it into an equi-join:
  * each interval explodes to every bucket it overlaps, each point maps to
  * its single bucket, the join key is the bucket, and the exact BETWEEN
  * filter runs only on bucket-collocated pairs. Work scales with
  * Σ interval_span / bucketWidth + matches, not the cross product; the
  * bucket width trades replication (long intervals → many buckets)
  * against candidate fan-in (wide buckets → more false candidates) and
  * should be near the median interval span.
  */
object RangeJoin {

  /** Inner point-in-interval join on numeric (e.g. epoch-seconds) columns:
    * keeps (point row ++ interval row) for every interval containing the
    * point, inclusive on both ends. Non-key column names must be disjoint.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val b = intervals.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    p.join(b, "__bucket")
      .filter(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("__bucket")
  }
}
