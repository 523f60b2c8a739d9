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
