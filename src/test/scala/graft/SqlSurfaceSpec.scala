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
}
