package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mars.Incremental
import graft.streaming.SnapshotSink

/** [[SnapshotSink]] — exactly-once streaming upsert/SCD2 into the
  * versioned snapshot store: the batch-id watermark is published in the
  * same atomic commit as the data, so replays are no-ops and crashes
  * before the commit are invisible.
  */
class SnapshotSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp() = Files.createTempDirectory("snap_sink").toString

  test("streaming upsert: each micro-batch is one committed version, keys upserted") {
    import spark.implicits._
    val target = tmp() + "/table"; val ckpt = tmp()
    val input = MemoryStream[(Long, String)](spark)
    val q = SnapshotSink.upsertStream(
      input.toDF().toDF("k", "payload"), target,
      keys = Seq("k"), checkpointDir = ckpt)
    try {
      input.addData((1L, "a0"), (2L, "b0"))
      q.processAllAvailable()
      input.addData((2L, "b1"), (3L, "c1"))
      q.processAllAvailable()
      val got = Incremental.read(spark, target)
        .select("k", "payload").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === Set((1L, "a0"), (2L, "b1"), (3L, "c1")))
      assert(Incremental.snapshots(spark, target).size === 2)
      assert(SnapshotSink.lastBatchId(spark, target) === 1L)
    } finally q.stop()
  }

  test("rows tying a previous batch's watermark value are NOT dropped") {
    import spark.implicits._
    val target = tmp() + "/table"
    // both batches share one date-grain watermark value — the dbt
    // is_incremental() guard would silently drop batch 1's new key
    assert(SnapshotSink.applyUpsert(
      Seq((1L, "a", "2024-01-01")).toDF("k", "payload", "ingestion_date"),
      0, target, Seq("k")))
    assert(SnapshotSink.applyUpsert(
      Seq((2L, "b", "2024-01-01")).toDF("k", "payload", "ingestion_date"),
      1, target, Seq("k")))
    assert(Incremental.read(spark, target).count() === 2)
  }

  test("a replayed batch id is a no-op: no new version, no changed rows") {
    import spark.implicits._
    val target = tmp() + "/table"
    val b0 = Seq((1L, "a")).toDF("k", "payload")
    val b1 = Seq((1L, "a2"), (2L, "b")).toDF("k", "payload")
    assert(SnapshotSink.applyUpsert(b0, 0, target, Seq("k")))
    assert(SnapshotSink.applyUpsert(b1, 1, target, Seq("k")))
    // foreachBatch re-delivery after a crash-after-commit
    assert(!SnapshotSink.applyUpsert(b1, 1, target, Seq("k")))
    assert(!SnapshotSink.applyUpsert(b0, 0, target, Seq("k")))
    assert(Incremental.snapshots(spark, target).size === 2)
    assert(Incremental.read(spark, target).count() === 2)
  }

  test("a crash BEFORE the commit marker leaves no trace, so the replay applies") {
    import spark.implicits._
    val target = tmp() + "/table"
    assert(SnapshotSink.applyUpsert(
      Seq((1L, "a")).toDF("k", "payload"), 0, target, Seq("k")))
    // crash at the stage step: data staged, never renamed
    Seq((9L, "ghost")).toDF("k", "payload")
      .write.parquet(s"$target/_stage_crashed")
    assert(SnapshotSink.lastBatchId(spark, target) === 0L)
    assert(SnapshotSink.applyUpsert(
      Seq((2L, "b")).toDF("k", "payload"), 1, target, Seq("k")))
    assert(Incremental.read(spark, target).count() === 2)
  }

  test("a crash AFTER the rename but BEFORE the commit marker also replays") {
    import spark.implicits._
    val target = tmp() + "/table"
    assert(SnapshotSink.applyUpsert(
      Seq((1L, "a")).toDF("k", "payload"), 0, target, Seq("k")))
    // the torn middle: an orphaned version dir ALREADY CARRYING batch 1's
    // meta, claimed but never committed. Its watermark must not count —
    // otherwise the replayed batch is skipped and its rows lost forever.
    Seq((1L, "a"), (2L, "lost")).toDF("k", "payload")
      .write.parquet(s"$target/v00000002")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$target/v00000002/_snapshot_meta"),
      s"${SnapshotSink.BatchIdKey}=1\n")
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$target/_claim_v00000002"))
    assert(SnapshotSink.lastBatchId(spark, target) === 0L)
    assert(SnapshotSink.applyUpsert(
      Seq((1L, "a"), (2L, "recovered")).toDF("k", "payload"), 1, target, Seq("k")))
    assert(Incremental.read(spark, target)
      .filter(col("k") === 2L).select("payload").first().getString(0)
      === "recovered")
  }

  test("the watermark survives vacuum across an interleaved meta-less merge") {
    import spark.implicits._
    val target = tmp() + "/table"
    assert(SnapshotSink.applyUpsert(
      Seq((1L, "a")).toDF("k", "payload"), 0, target, Seq("k")))
    assert(SnapshotSink.applyUpsert(
      Seq((2L, "b")).toDF("k", "payload"), 1, target, Seq("k")))
    // a non-streaming merge that sets no meta (meta inherits), then a
    // vacuum that drops every version the sink itself published
    Incremental.upsertSnapshot(spark, target,
      Seq((3L, "c")).toDF("k", "payload"), Seq("k"))
    Incremental.vacuum(spark, target, keep = 1)
    assert(Incremental.snapshots(spark, target).size === 1)
    assert(SnapshotSink.lastBatchId(spark, target) === 1L)
    assert(!SnapshotSink.applyUpsert(
      Seq((2L, "dup")).toDF("k", "payload"), 1, target, Seq("k")))
  }

  test("compaction preserves the batch-id watermark (meta carried forward)") {
    import spark.implicits._
    val target = tmp() + "/table"
    assert(SnapshotSink.applyUpsert(
      Seq((1L, "a")).toDF("k", "payload"), 0, target, Seq("k")))
    assert(SnapshotSink.applyUpsert(
      Seq((2L, "b")).toDF("k", "payload"), 1, target, Seq("k")))
    assert(Incremental.compact(spark, target))
    Incremental.vacuum(spark, target, keep = 1)
    assert(SnapshotSink.lastBatchId(spark, target) === 1L)
    assert(!SnapshotSink.applyUpsert(
      Seq((2L, "b")).toDF("k", "payload"), 1, target, Seq("k")))
  }

  test("the sink resumes from its checkpoint across a stream restart, no dup, no gap") {
    import org.apache.spark.sql.types._
    val in = tmp(); val target = tmp() + "/table"; val ckpt = tmp()
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("payload", StringType)))
    def source() = spark.readStream.schema(schema).json(in)
    def run(): Unit = {
      val q = SnapshotSink.upsertStream(source(), target,
        keys = Seq("k"), checkpointDir = ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    Files.writeString(java.nio.file.Paths.get(s"$in/b0.json"),
      "{\"k\":1,\"payload\":\"a0\"}\n{\"k\":2,\"payload\":\"b0\"}\n")
    run() // first incarnation folds batch 0, then "crashes" (stop)
    val idAfterFirst = SnapshotSink.lastBatchId(spark, target)
    assert(idAfterFirst >= 0L)
    Files.writeString(java.nio.file.Paths.get(s"$in/b1.json"),
      "{\"k\":2,\"payload\":\"b1\"}\n{\"k\":3,\"payload\":\"c1\"}\n")
    run() // second incarnation resumes from the SAME checkpoint
    val got = Incremental.read(spark, target)
      .select("k", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "a0"), (2L, "b1"), (3L, "c1")))
    // ids continued (no reset to 0 = no replay-skip hazard), exactly one
    // new committed version for the one new batch
    assert(SnapshotSink.lastBatchId(spark, target) > idAfterFirst)
    assert(Incremental.snapshots(spark, target).size === 2)
    // a third incarnation with NO new data folds nothing
    run()
    assert(Incremental.snapshots(spark, target).size === 2)
  }

  test("streaming SCD2 equals the batch one-shot reconstruction") {
    import spark.implicits._
    val target = tmp() + "/table"; val ckpt = tmp()
    val sf = "/root/testdata/sf0.001"
    val changes = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"))
    val half = "2024-01-15"
    val input = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val q = SnapshotSink.scd2Stream(
      input.toDF().toDF("user_id", "event_type", "ts"), target,
      keys = Seq("user_id"), updatedAt = "ts", checkCols = Seq("event_type"),
      checkpointDir = ckpt)
    def feed(df: org.apache.spark.sql.DataFrame): Unit = {
      input.addData(df.collect().toIndexedSeq.map(r =>
        (r.getLong(0), r.getString(1), r.getTimestamp(2))))
      q.processAllAvailable()
    }
    try {
      feed(changes.filter(to_date(col("ts")) < lit(half)))
      feed(changes.filter(to_date(col("ts")) >= lit(half)))
      val got = Incremental.read(spark, target)
        .select("user_id", "event_type", "valid_from", "valid_to")
        .collect().map(r => (r.getLong(0), r.getString(1), r.get(2), r.get(3)))
        .toSet
      val oneShot = SparkEntry.queries("q61_scd2")(spark, sf)
        .select(col("user_id"), col("state"), col("valid_from"), col("valid_to"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.get(2), r.get(3)))
        .toSet
      assert(got === oneShot)
    } finally q.stop()
  }
}
