package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mars.Incremental
import graft.streaming.{AggSink, SnapshotSink}

/** [[AggSink]] — exactly-once streaming aggregate mart: combinable
  * partials folded per micro-batch, batch id committed atomically with
  * the mart version, replays no-ops, time travel over mart states.
  */
class AggSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp() = Files.createTempDirectory("agg_sink").toString

  test("streamed mart equals the batch group-by; one version per batch") {
    import spark.implicits._
    val target = tmp() + "/mart"; val ckpt = tmp()
    val input = MemoryStream[(String, Long)](spark)
    val q = AggSink.aggStream(input.toDF().toDF("k", "qty"), target,
      keys = Seq("k"), sums = Seq("qty"), checkpointDir = ckpt)
    val all = Seq(
      Seq(("a", 10L), ("b", 5L)),
      Seq(("a", 1L), ("c", 9L)),
      Seq(("b", 30L), ("c", 2L), ("a", 4L)))
    try {
      all.foreach { batch => input.addData(batch: _*); q.processAllAvailable() }
      val got = AggSink.read(spark, target, avgsOf = Seq("qty"))
        .orderBy("k").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      val expect = all.flatten.toDF("k", "qty").groupBy("k")
        .agg(count(lit(1)).as("n"), sum("qty").as("s"),
          (sum("qty") / count(lit(1))).as("a"))
        .orderBy("k").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(got.toSeq == expect.toSeq)
      assert(Incremental.snapshots(spark, target).size == 3)
      // time travel: the mart after batch 0 only knows the first rows
      val v1 = Incremental.readVersion(spark, target, 1)
        .orderBy("k").collect().map(r => (r.getString(0), r.getLong(2))).toSeq
      assert(v1 == Seq(("a", 10L), ("b", 5L)))
    } finally q.stop()
  }

  test("a replayed batch id is a no-op: counts do not double") {
    import spark.implicits._
    val target = tmp() + "/mart"
    val b0 = Seq(("a", 2L), ("a", 3L)).toDF("k", "qty")
    assert(AggSink.applyBatch(b0, 0L, target, Seq("k"), sums = Seq("qty")))
    val b1 = Seq(("a", 5L), ("b", 7L)).toDF("k", "qty")
    assert(AggSink.applyBatch(b1, 1L, target, Seq("k"), sums = Seq("qty")))
    // crash-after-commit replay: same id arrives again
    assert(!AggSink.applyBatch(b1, 1L, target, Seq("k"), sums = Seq("qty")))
    val got = AggSink.read(spark, target).orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 3L, 10L), ("b", 1L, 7L)))
    assert(SnapshotSink.lastBatchId(spark, target) == 1L)
  }

  test("streamed kmv + hist partials equal the batch one-shot; replay no-ops (r9)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val target = tmp() + "/mart"; val ckpt = tmp()
    val input = MemoryStream[(String, Long, Long)](spark)
    // three micro-batches maintaining BOTH sketch partials alongside an
    // algebraic sum — the streaming face of the two maintain-and-serve
    // loops (kmv r7, hist r8)
    val q = AggSink.aggStream(input.toDF().toDF("k", "h", "v"), target,
      keys = Seq("k"), sums = Seq("v"), checkpointDir = ckpt,
      kmvs = Seq("h"), kmvK = 4, hists = Seq("v"), histWidth = 8)
    val all = Seq(
      Seq(("a", 50L, 3L), ("a", 10L, 17L), ("b", 7L, 40L)),
      Seq(("a", 3L, 18L), ("a", 99L, 9L), ("b", 2L, 5L)),
      Seq(("a", 4L, 25L), ("a", 8L, 2L), ("b", 7L, 41L), ("c", 1L, 0L)))
    try {
      all.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    def shape(r: org.apache.spark.sql.Row) = (
      r.getString(r.fieldIndex("k")),
      r.getLong(r.fieldIndex("sum_v")),
      r.getSeq[Long](r.fieldIndex("kmv_h")),
      r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("hist_v_w8"))
        .map(c => (c.getLong(0), c.getLong(1))))
    val got = AggSink.read(spark, target).orderBy("k").collect().map(shape).toSeq
    val oneShot = all.flatten.toDF("k", "h", "v").groupBy("k")
      .agg(sum("v").as("sum_v"),
        call_function("kmin_values", col("h"), lit(4)).as("kmv_h"),
        call_function("hist_cells", col("v"), lit(8)).as("hist_v_w8"))
      .orderBy("k").collect().map(shape).toSeq
    assert(got == oneShot,
      "stream-folded sketch partials must equal the batch one-shot")
    // crash-after-commit replay of the LAST batch is a no-op
    assert(!AggSink.applyBatch(all.last.toDF("k", "h", "v"), 2L, target,
      Seq("k"), sums = Seq("v"), kmvs = Seq("h"), kmvK = 4,
      hists = Seq("v"), histWidth = 8))
    assert(AggSink.read(spark, target).orderBy("k").collect()
      .map(shape).toSeq == oneShot)
  }

  test("restart from the checkpoint resumes without duplicating the mart") {
    import org.apache.spark.sql.types._
    val in = tmp(); val target = tmp() + "/mart"; val ckpt = tmp()
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("qty", LongType)))
    def run(): Unit = {
      val q = AggSink.aggStream(
        spark.readStream.schema(schema).json(in), target,
        keys = Seq("k"), sums = Seq("qty"), checkpointDir = ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    Files.writeString(java.nio.file.Paths.get(s"$in/b0.json"),
      "{\"k\":\"a\",\"qty\":1}\n{\"k\":\"b\",\"qty\":2}\n")
    run() // first incarnation folds batch 0, then "crashes" (stop)
    Files.writeString(java.nio.file.Paths.get(s"$in/b1.json"),
      "{\"k\":\"a\",\"qty\":10}\n")
    run() // second incarnation resumes from the SAME checkpoint
    val got = AggSink.read(spark, target).orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 2L, 11L), ("b", 1L, 2L)))
    // a third incarnation with no new data folds nothing
    val versions = Incremental.snapshots(spark, target).size
    run()
    assert(Incremental.snapshots(spark, target).size == versions)
  }
}
