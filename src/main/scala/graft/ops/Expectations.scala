package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the contract gate a 100 TB
  * ingest runs BEFORE publishing a batch (and the dbt-tests surface the
  * reference leaves to Snowflake constraints). Three rule families:
  *
  *  - row rules: any boolean Column over a single row; ALL rules for a
  *    table evaluate in ONE aggregation pass (conditional sums), so N
  *    rules cost one scan — never N scans;
  *  - uniqueness: n_rows − count(distinct key);
  *  - referential integrity: child keys absent from the parent (left-anti
  *    count; the parent side aggregates/broadcasts when small).
  *
  * Every check emits the same (rule, n_violations, n_checked, passed)
  * shape so reports union and sinks stay uniform. All measures are
  * integer counts — engine-exact.
  */
object Expectations {

  final case class Rule(name: String, violatedWhen: Column)

  /** All row rules in one aggregation pass over `df`. */
  def checkRows(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = count(lit(1)).as("n_checked") +:
      rules.map(r => sum(when(r.violatedWhen, 1L).otherwise(0L)).as(r.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.select(explode(array(rules.map(r =>
        struct(lit(r.name).as("rule"), col(r.name).as("n_violations"),
          col("n_checked").as("n_checked"))): _*)).as("c"))
      .select(col("c.rule"), col("c.n_violations"), col("c.n_checked"),
        (col("c.n_violations") === 0L).as("passed"))
  }

  /** Uniqueness of a key tuple: violations = rows beyond one per key. */
  def checkUnique(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("n_checked"),
        countDistinct(keyCols.head, keyCols.tail: _*).as("n_distinct"))
      .select(lit(name).as("rule"),
        (col("n_checked") - col("n_distinct")).as("n_violations"),
        col("n_checked"),
        (col("n_checked") === col("n_distinct")).as("passed"))

  /** Referential integrity: child rows whose key has no parent row. One
    * left join + aggregation (NOT an anti-join count cross-joined to a
    * total-count — two 1-row frames would plan a nested loop); the parent
    * side deduplicates to its key set first so the join can't fan out. */
  def checkReferential(child: DataFrame, parent: DataFrame, name: String,
                       childKey: String, parentKey: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey)).distinct(),
        col(childKey) === col(parentKey), "left")
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col(parentKey).isNull, 1L).otherwise(0L)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations"), col("n_checked"),
        (col("n_violations") === 0L).as("passed"))
}
