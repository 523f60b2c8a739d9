package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-earlier) join — an operator Spark lacks natively.
  *
  * For each left row, attach the latest right row whose timestamp is <=
  * the left row's, within the same key group (classic telemetry/market-data
  * enrichment). Implemented by composition, per the custom-operator
  * preference ladder: tag both sides, union them, and carry the right
  * side's values forward with `last(_, ignoreNulls)` over a key-partitioned
  * window ordered by (ts, side) — right rows sort before left rows at equal
  * timestamps, so ties match (left.ts >= right.ts).
  *
  * Scale shape: ONE shuffle (hash on the key) + one per-partition sort —
  * the naive range-join formulation explodes to |left|×|right| pairs per
  * key before filtering, which the planner must never see. Skewed keys
  * fall to [[Skew]]-style salting with per-salt windows.
  *
  * Requirements: non-key column names must be disjoint between the sides
  * (rename before calling); if several right rows share (key, ts), which
  * one wins is unspecified — pre-dedup the right side for determinism.
  */
object AsOf {

  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String): DataFrame = {
    val carryCols = right.columns.filterNot(keys.contains).toSeq
    val leftCols = left.columns.toSeq

    val taggedLeft = carryCols.foldLeft(
      left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))) {
      (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val taggedRight = leftCols.filterNot(keys.contains).foldLeft(
      right.withColumn("__ts", col(rightTs)).withColumn("__side", lit(0))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    carryCols.foldLeft(taggedLeft.unionByName(taggedRight)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
      .filter(col("__side") === 1)
      .drop("__ts", "__side")
      .select((leftCols ++ carryCols).map(col): _*)
  }
}
