package graft.ops

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast hint (SURVEY §2.12; VERDICT r2 item 1).
  *
  * A hard-coded `broadcast(df)` is the right plan exactly until the side
  * outgrows executor memory — then it is the plan that OOMs a 1000-executor
  * cluster. This helper makes the decision the way Spark's own planner does:
  * from the Catalyst size estimate of the side's optimized plan (for a
  * parquet scan that estimate is MEASURED — file footer bytes scaled by the
  * projected-column ratio), compared against the session's
  * `spark.sql.autoBroadcastJoinThreshold`.
  *
  * Why pin at all, instead of leaving the join unhinted? Determinism: when a
  * side's runtime size straddles the threshold, AQE flips the strategy
  * run-to-run (measured as 2s-vs-8s bimodal timing on the near-dup pair join
  * at sf0.1). Pinning from the *static* estimate keeps the plan stable for a
  * given dataset while still flipping to shuffle when the data is genuinely
  * big — and once we decline to pin, AQE remains free to re-plan from exact
  * runtime sizes, which is the behavior you want at 100 TB.
  *
  * `inflation` covers sides whose in-memory row is wider than its scan bytes
  * (e.g. a token-array projection of a text column): the estimate is
  * multiplied by it before the comparison, so gates on derived frames stay
  * conservative.
  */
object AutoBroadcast {

  /** The session's broadcast threshold in bytes; <= 0 means disabled. */
  def thresholdBytes(df: DataFrame): Long = {
    val raw = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
    try raw.toLong
    catch { case _: NumberFormatException => JavaUtils.byteStringAsBytes(raw) }
  }

  /** Catalyst's size estimate for the frame's optimized plan, in bytes.
    * Driver-side plan work only — never launches a job. */
  def estimatedBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** The gate decision alone, from a separate estimate source — for
    * sides that get materialized (localCheckpoint) before joining, where
    * the post-checkpoint plan no longer carries a usable estimate:
    * decide from the PRE-checkpoint frame, apply to the checkpointed
    * one. */
  def decideFrom(estimateFrom: DataFrame, inflation: Double = 1.0): Boolean = {
    val t = thresholdBytes(estimateFrom)
    t > 0 && estimatedBytes(estimateFrom).toDouble * inflation <= t.toDouble
  }

  /** `broadcast(df)` iff the measured/estimated size (times `inflation`)
    * fits the session broadcast threshold; otherwise the frame unhinted, so
    * the join plans as shuffle (and AQE may still locally convert it from
    * exact runtime sizes). */
  def sizeGate(df: DataFrame, inflation: Double = 1.0): DataFrame =
    if (decideFrom(df, inflation)) broadcast(df) else df
}
