package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.mars.Incremental

/** [[Incremental.replacePartitions]] — dbt insert_overwrite semantics:
  * only the partitions present in the incoming batch are replaced; IO
  * and risk are proportional to the touched partitions, never the table.
  */
class ReplacePartitionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_overwrite").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/table"
  }

  test("only incoming partitions are replaced; others survive byte-for-byte") {
    import spark.implicits._
    val t = tmp()
    val initial = Seq(
      (1, "2024-01-01", "old-a"), (2, "2024-01-01", "old-b"),
      (3, "2024-01-02", "old-c"),
      (4, "2024-01-03", "old-d"), (5, "2024-01-03", "old-e"))
      .toDF("id", "day", "payload")
    Incremental.replacePartitions(spark, t, initial, Seq("day"))

    // rebuild ONE day with a different row count — classic reprocessing
    val rebuilt = Seq((30, "2024-01-02", "new-c"), (31, "2024-01-02", "new-x"))
      .toDF("id", "day", "payload")
    Incremental.replacePartitions(spark, t, rebuilt, Seq("day"))

    // partition values come back type-inferred from directory names
    // (dates parse as DATE) — normalize for the comparison
    val got = spark.read.parquet(t)
      .select(col("id"), col("day").cast("string").as("day"), col("payload"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      (1, "2024-01-01", "old-a"), (2, "2024-01-01", "old-b"),
      (30, "2024-01-02", "new-c"), (31, "2024-01-02", "new-x"),
      (4, "2024-01-03", "old-d"), (5, "2024-01-03", "old-e")))
  }

  test("an empty-overlap batch adds partitions without touching existing ones") {
    import spark.implicits._
    val t = tmp()
    Incremental.replacePartitions(spark, t,
      Seq((1, "a", "p1")).toDF("id", "day", "payload"), Seq("day"))
    Incremental.replacePartitions(spark, t,
      Seq((2, "b", "p2")).toDF("id", "day", "payload"), Seq("day"))
    assert(spark.read.parquet(t).count() === 2)
  }

  test("a versioned snapshot root is refused (write would be invisible)") {
    import spark.implicits._
    val t = tmp()
    Incremental.mergeIncremental(spark, t,
      Seq((1, "d1", "p")).toDF("id", "day", "payload"),
      Seq("id"), watermarkCol = "day")
    intercept[IllegalArgumentException] {
      Incremental.replacePartitions(spark, t,
        Seq((2, "d2", "q")).toDF("id", "day", "payload"), Seq("day"))
    }
  }

  test("partition filters prune directories at planning time") {
    import spark.implicits._
    val t = tmp()
    Incremental.replacePartitions(spark, t,
      (0 until 100).map(i => (i, s"d${i % 10}", s"p$i"))
        .toDF("id", "day", "payload"), Seq("day"))
    val q = spark.read.parquet(t).filter(col("day") === "d3")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    assert(scan.partitionFilters.nonEmpty,
      "filter on the partition column must become a partition filter")
    // planner selected only the d3 directory — 1 of 10 partitions
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .length === 1)
    assert(q.count() === 10)
  }
}
