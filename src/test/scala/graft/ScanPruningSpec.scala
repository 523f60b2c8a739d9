package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** The "filters and column selection reach the scan" discipline, asserted
  * on real plans: a scan that reads all columns for a narrow projection
  * (or re-filters rows Parquet could have skipped) is wrong at 100 TB
  * even when every answer is right. Representative queries pin the
  * contract; FileSourceScanExec is inspected directly (requiredSchema =
  * the columns actually decoded, metadata PushedFilters = predicates
  * handed to the reader).
  */
class ScanPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def scansOf(name: String): Seq[FileSourceScanExec] =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.sparkPlan.collect { case s: FileSourceScanExec => s }

  private def scanCols(name: String, table: String): Set[String] =
    scansOf(name)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains(table)))
      .flatMap(_.requiredSchema.fieldNames).toSet

  private def pushed(name: String, table: String): String =
    scansOf(name)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains(table)))
      .map(_.metadata.getOrElse("PushedFilters", "")).mkString(";")

  test("q60_variant decodes only the three event columns it uses") {
    assert(scanCols("q60_variant", "events") ===
      Set("event_id", "event_type", "props"))
  }

  test("q16_events_hourly decodes only ts/event_type/value") {
    assert(scanCols("q16_events_hourly", "events") ===
      Set("ts", "event_type", "value"))
  }

  test("q1_agg prunes lineitem to the aggregated columns + filter column") {
    val cols = scanCols("q1_agg", "lineitem")
    assert(cols.contains("l_returnflag") && cols.contains("l_quantity"))
    assert(!cols.contains("l_orderkey") && !cols.contains("l_partkey"),
      s"join keys decoded for a pure aggregation: $cols")
  }

  test("q2_filter_project pushes both predicates into the orders scan") {
    val pf = pushed("q2_filter_project", "orders")
    assert(pf.contains("o_orderstatus") && pf.contains("o_totalprice"), pf)
  }

  test("td_exact_dedup does not decode unused document columns") {
    val cols = scanCols("td_exact_dedup", "documents")
    assert(!cols.contains("lang") && !cols.contains("n_chars"),
      s"unused columns decoded: $cols")
  }

  test("q3_join_agg decodes only join keys + measures from the fact scans") {
    val li = scanCols("q3_join_agg", "lineitem")
    assert(li === Set("l_orderkey", "l_extendedprice", "l_discount"), li)
    val ord = scanCols("q3_join_agg", "orders")
    assert(ord === Set("o_orderkey", "o_custkey"), ord)
  }
}
