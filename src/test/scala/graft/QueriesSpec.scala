package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.GraftFunctions.register(s)
    s
  }
}

class QueriesSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and is non-trivial") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      // q4-style anti joins may legitimately shrink, but zero rows at
      // sf0.001 would make the oracle check vacuous.
      assert(df.count() > 0, s"$name returned 0 rows at $sf")
    }
  }

  test("q20 approx distinct stays within 5% of the exact count") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("q20_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k: approx $a vs exact $e")
    }
  }

  test("q1_agg has the aliased columns the oracle expects") {
    val cols = SparkEntry.queries("q1_agg")(spark, sf).columns.toSet
    assert(Set("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
      "sum_disc_price", "avg_qty", "count_order").subsetOf(cols))
  }
}
