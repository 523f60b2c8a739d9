package graft

import org.scalatest.funsuite.AnyFunSuite

class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("spark.sql works over base tables and warehouse models after registerAll") {
    SqlSurface.registerAll(spark, "/root/testdata/sf0.001")
    // base table + registered function in one statement
    val li = spark.sql(
      "SELECT l_returnflag, count(*) n, md5_prefix64(l_returnflag) h " +
        "FROM lineitem GROUP BY 1 ORDER BY 1").collect()
    assert(li.nonEmpty && li.forall(_.getLong(2) >= 0))
    // warehouse model by its dbt name, joined to a dim — the reference's
    // own daily-activity shape expressed as ad-hoc SQL
    val mart = spark.sql(
      """SELECT r.rover_name, count(*) AS n_photos
        |FROM fact_photos f JOIN dim_rovers r ON f.rover_id = r.rover_id
        |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(mart.nonEmpty)
    // view semantics: re-registration is idempotent
    SqlSurface.registerAll(spark, "/root/testdata/sf0.001")
    assert(spark.sql("SELECT count(*) FROM documents").first().getLong(0) > 0)
  }

  test("NOT IN follows three-valued logic when the subquery yields a null") {
    SqlSurface.registerTables(spark, "/root/testdata/sf0.001")
    // one NULL in the IN-list makes every NOT IN comparison UNKNOWN → the
    // ANSI trap engines must preserve (Spark plans the single-column case
    // as a null-aware anti join rather than a naive LeftAnti)
    val withNull = spark.sql(
      """SELECT count(*) AS n FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT nullif(o_custkey, o_custkey) FROM orders)""".stripMargin)
      .first().getLong(0)
    assert(withNull == 0L, "NOT IN over a null-bearing list must match no rows")
    // the guarded form is the plain anti join
    val guarded = spark.sql(
      """SELECT count(*) AS n FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)""".stripMargin)
      .first().getLong(0)
    val expected = Tables.customer(spark, "/root/testdata/sf0.001")
      .join(Tables.orders(spark, "/root/testdata/sf0.001"),
        org.apache.spark.sql.functions.col("c_custkey") ===
          org.apache.spark.sql.functions.col("o_custkey"), "left_anti")
      .count()
    assert(guarded == expected)
  }
}
