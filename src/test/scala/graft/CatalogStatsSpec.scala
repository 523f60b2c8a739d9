package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Catalog tables + CBO statistics — the metastore integration a shared
  * 100 TB warehouse runs on: `saveAsTable` registers a session-catalog
  * table, `ANALYZE TABLE` computes size/row statistics, and the
  * cost-based optimizer consumes them (visible as rowCount in the
  * optimized plan's stats). Path-based reads size relations by file
  * bytes alone; analyzed tables give the planner real cardinalities.
  */
class CatalogStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("saveAsTable + ANALYZE: stats land in the catalog and reach the planner") {
    val name = "graft_stats_dim"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // rowCount only propagates into plan statistics under the cost-based
    // optimizer (off by default; size-in-bytes estimation otherwise)
    val cboKey = "spark.sql.cbo.enabled"
    val prevCbo = spark.conf.getOption(cboKey)
    spark.conf.set(cboKey, "true")
    try {
      Tables.supplier(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").saveAsTable(name)
      spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS")
      val described = spark.sql(s"DESCRIBE EXTENDED $name").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      val statsLine = described.getOrElse("Statistics", "")
      assert(statsLine.contains("rows"), s"expected row stats, got: $described")

      // the planner sees the analyzed cardinality: rowCount flows into the
      // optimized plan's statistics for the catalog relation
      val expected = spark.table(name).count()
      val planStats = spark.table(name).queryExecution.optimizedPlan.stats
      assert(planStats.rowCount.exists(_.longValue == expected),
        s"CBO rowCount should be $expected, got ${planStats.rowCount}")

      // and a join against the analyzed small table broadcasts it
      val j = Tables.lineitem(spark, "/root/testdata/sf0.001")
        .join(spark.table(name), col("l_suppkey") === col("s_suppkey"))
        .agg(count(lit(1)).as("n"))
      j.collect()
      assert(j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      prevCbo match {
        case Some(v) => spark.conf.set(cboKey, v)
        case None => spark.conf.unset(cboKey)
      }
    }
  }
}
