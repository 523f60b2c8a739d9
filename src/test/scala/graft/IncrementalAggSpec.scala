package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IncrementalAgg

class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("three incremental updates equal one full recompute, including averages") {
    import spark.implicits._
    val store = Files.createTempDirectory("inc_agg").toString + "/mart"
    val batches = Seq(
      Seq(("a", 10L, 5.0), ("a", 20L, 7.0), ("b", 5L, 1.0)),
      Seq(("a", 1L, 2.0), ("c", 9L, 9.0)),
      Seq(("b", 30L, 4.0), ("c", 2L, 3.0), ("c", 4L, 6.0)))
    batches.foreach { rows =>
      IncrementalAgg.update(spark, store, rows.toDF("k", "qty", "price"),
        keys = Seq("k"), sums = Seq("qty", "price"),
        mins = Seq("price"), maxs = Seq("qty"))
    }
    val got = IncrementalAgg.read(spark, store, avgsOf = Seq("price"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6)))
    val full = batches.flatten.toDF("k", "qty", "price")
      .groupBy("k").agg(
        count(lit(1)).as("n_rows"), sum("qty").as("sum_qty"),
        sum("price").as("sum_price"), min("price").as("min_price"),
        max("qty").as("max_qty"),
        (sum("price") / count(lit(1))).as("avg_price"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6)))
    assert(got.toSeq == full.toSeq)
  }
}
