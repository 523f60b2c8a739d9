package graft

import org.scalatest.funsuite.AnyFunSuite

/** Three-way consistency: for queries whose oracle SQL is plain ANSI, the
  * SAME text that DuckDB executes also runs on Spark (via SqlSurface
  * views) and returns exactly what the DataFrame formulation returns.
  * DataFrame API ≡ Spark SQL ≡ DuckDB on one statement — the strongest
  * cheap cross-engine consistency check available.
  */
class SqlParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // oracle SQL that is ANSI enough for Spark's parser (no DuckDB-isms
  // like list_*, epoch(), QUALIFY, VALUES row aliases, :: casts)
  private val ansiQueries = Seq(
    "q1_agg", "q2_filter_project", "q9_conditional_pivot",
    "q15_count_distinct", "q32_semi_join", "q33_scalar_subquery",
    "q34_exists_correlated", "q36_setops")

  test("oracle SQL runs unmodified on Spark and matches the DataFrame API") {
    SqlSurface.registerTables(spark, sf)
    val failures = ansiQueries.flatMap { name =>
      try {
        val viaSql = spark.sql(SparkEntry.oracleSql(name))
          .collect().map(_.toString).sorted.toSeq
        val viaDf = SparkEntry.queries(name)(spark, sf)
          .collect().map(_.toString).sorted.toSeq
        if (viaSql == viaDf) None
        else Some(s"$name: sql=${viaSql.take(2)}... df=${viaDf.take(2)}...")
      } catch { case e: Exception => Some(s"$name: ${e.getMessage.take(200)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
