package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling: row count, null count, exact distinct count per
  * column — the health check run before trusting any new feed.
  *
  * Shape: ONE aggregation computes every column's stats (Catalyst plans
  * the multi-distinct via Expand — one corpus pass with a per-column
  * expansion, not one pass per column), then the single result row is
  * exploded into (column, stat) rows driver-side free. Profiling N
  * columns of 100 TB costs one scan.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs =
      count(lit(1)).as("__n") +:
        cols.flatMap(c => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
          count_distinct(col(c)).as(s"__nd_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = explode(array(cols.map(c => struct(
      lit(c).as("column"),
      col("__n").as("n_rows"),
      coalesce(col(s"__nn_$c"), lit(0L)).as("n_null"),
      col(s"__nd_$c").as("n_distinct"))): _*)).as("s")
    one.select(stacked).select("s.column", "s.n_rows", "s.n_null", "s.n_distinct")
  }
}
