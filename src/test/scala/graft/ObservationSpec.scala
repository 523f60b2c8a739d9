package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `Dataset.observe` — pipeline health metrics collected DURING the one
  * real pass, not by a second scan. At 100 TB a separate `count()` /
  * quality probe re-reads the corpus; observe() rides the action that was
  * running anyway (the curation-funnel counters of a production ingest).
  */
class ObservationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("observe rides the running action instead of a second scan") {
    val obs = Observation("ingest_health")
    val li = Tables.lineitem(spark, sf)
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(when(col("l_quantity") <= 0, 1).otherwise(0)).as("bad_qty"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"))
    // the observed metrics describe ALL rows flowing through the observe
    // point, not the post-filter survivors
    val survivors = li.filter(col("l_quantity") > 10).count()
    val m = obs.get
    assert(m("rows_seen").asInstanceOf[Long] > survivors)
    assert(m("bad_qty").asInstanceOf[Long] == 0L)
    assert(m("approx_orders").asInstanceOf[Long] > 0L)
  }
}
