package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime row- and partition-level pruning — the two Catalyst mechanisms
  * that make selective fact⋈dim joins cheap at 100 TB without touching
  * query code:
  *
  *  - runtime BLOOM filter (InjectRuntimeFilter): a selective creation
  *    side builds a bloom_filter_agg, and the big application side gets a
  *    might_contain() predicate pushed into its scan — rows that cannot
  *    join are dropped before the shuffle, cutting exchange volume by the
  *    join selectivity.
  *  - dynamic partition pruning: when the big side is PARTITIONED on the
  *    join key, the dim side's filter result prunes entire partitions
  *    (files never opened) via a dynamicpruning subquery in the scan's
  *    PartitionFilters.
  *
  * Thresholds here are lowered only because the fixture is tiny; at real
  * scale the defaults (10 GB application-side scan, 10 MB creation side)
  * gate exactly the joins that deserve the filter.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def withConfs[A](confs: Seq[(String, String)])(body: => A): A = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective shuffle join injects a bloom runtime filter on the fact side") {
    withConfs(Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // the fixture scan is KB-sized; drop the 10 GB application-side gate
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      val li = Tables.lineitem(spark, sf)
      val urgent = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a bloom runtime filter in:\n${plan.take(4000)}")
    }
  }

  test("join against a filtered dim prunes partitions dynamically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    // fact partitioned on a supplier bucket (the cluster_by layout §2.9
    // maps to): one directory per bucket
    Tables.lineitem(spark, sf)
      .withColumn("bucket", col("l_suppkey") % 10)
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
    val fact = spark.read.parquet(dir)
    // the dim filter must be DATA-dependent (name → bucket is a table
    // relationship, not an expression) — a filter expressible in terms of
    // the join column would constant-propagate into a static partition
    // filter instead (strictly better, but not what this test pins down)
    val dim = Tables.supplier(spark, sf)
      .filter(col("s_name").endsWith("3"))
      .select((col("s_suppkey") % 10).as("dbucket")).distinct()
    val j = fact.join(dim, col("bucket") === col("dbucket"))
      .agg(count(lit(1)).as("n"))
    val n = j.collect()(0).getLong(0)
    assert(n > 0)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic partition pruning in:\n${plan.take(4000)}")
  }
}
