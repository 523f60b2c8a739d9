package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` merges every ops module; each module keeps its Spark query and
  * its DuckDB oracle side by side so column aliases stay in lockstep (the
  * driver sorts columns by name before hashing).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Same shape as the reference's daily_activity mart (SURVEY §7.2):
    * multi-join (broadcast dim) + conditional-sum aggregation.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q3_join_agg")(spark, "/root/testdata/sf0.001")

  /** Public so PlanAuditSpec can enforce planTags PER MODULE (a tag
    * declared in one module for another module's query would pass a
    * global-union check while violating the co-location contract). */
  val modules: Seq[OpsModule] = Seq(Relational, MarsOps, TrainingOps)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_.oracles).reduce(_ ++ _)

  /** Plan-audit tags declared beside each module's registrations;
    * PlanAuditSpec consumes these (and fails on stale/dangling tags). */
  def planTags: Map[String, PlanTag] =
    modules.map(_.planTags).reduce(_ ++ _)
}
