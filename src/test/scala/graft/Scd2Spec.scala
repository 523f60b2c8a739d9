package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mars.Incremental

/** SCD2 snapshot materialization (dbt `snapshot`, check strategy).
  *
  * The load-bearing property: maintaining the table incrementally with
  * [[Incremental.scd2Merge]] — any forward-in-time batching — lands on
  * exactly the history the one-shot reconstruction (`q61_scd2`, oracle-
  * verified against DuckDB) computes from the full change log.
  */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_scd2").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/snap"
  }

  private def changes = Tables.events(spark, sf)
    .select(col("user_id"), col("event_type"), col("ts"))

  private def history(t: String): Set[(Long, String, Any, Any)] =
    Incremental.read(spark, t)
      .select("user_id", "event_type", "valid_from", "valid_to")
      .collect().map(r => (r.getLong(0), r.getString(1), r.get(2), r.get(3)))
      .toSet

  test("iterative scd2Merge over time batches equals the one-shot reconstruction") {
    val t = tmp()
    val days = changes.select(to_date(col("ts")).as("d")).distinct()
      .orderBy("d").collect().map(_.getDate(0).toString)
    // 6 forward-in-time batches of ~5 days each — batch boundaries are
    // arbitrary, the result must not depend on them
    days.grouped((days.length + 5) / 6).foreach { slice =>
      Incremental.scd2Merge(spark, t,
        changes.filter(to_date(col("ts")).cast("string").isin(slice.toSeq: _*)),
        keys = Seq("user_id"), updatedAt = "ts", checkCols = Seq("event_type"))
    }
    val oneShot = SparkEntry.queries("q61_scd2")(spark, sf)
      .select(col("user_id"), col("state"), col("valid_from"), col("valid_to"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.get(2), r.get(3)))
      .toSet
    assert(history(t) === oneShot)
    // exactly one open version per entity
    val badOpen = Incremental.read(spark, t).filter(col("valid_to").isNull)
      .groupBy("user_id").count().filter(col("count") =!= 1).count()
    assert(badOpen === 0L)
  }

  test("random batch boundaries all land on the one-shot history (3 seeded trials)") {
    val days = changes.select(to_date(col("ts")).cast("string").as("d"))
      .distinct().orderBy("d").collect().map(_.getString(0))
    val oneShot = SparkEntry.queries("q61_scd2")(spark, sf)
      .select(col("user_id"), col("state"), col("valid_from"), col("valid_to"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.get(2), r.get(3)))
      .toSet
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val t = tmp()
      // random forward-in-time partition of the day range into 1..n runs
      val cuts = days.indices.tail.filter(_ => rnd.nextDouble() < 0.25)
      val slices = (0 +: cuts :+ days.length).distinct.sorted
        .sliding(2).map { case Seq(a, b) => days.slice(a, b) }.toSeq
      slices.filter(_.nonEmpty).foreach { slice =>
        Incremental.scd2Merge(spark, t,
          changes.filter(to_date(col("ts")).cast("string")
            .isin(slice.toIndexedSeq: _*)),
          keys = Seq("user_id"), updatedAt = "ts", checkCols = Seq("event_type"))
      }
      assert(history(t) === oneShot, s"seed $seed diverged (${slices.length} batches)")
    }
  }

  test("re-applying a processed batch is a no-op; late data is dropped") {
    val t = tmp()
    val cut = "2024-01-15"
    val early = changes.filter(to_date(col("ts")) < lit(cut))
    val late = changes.filter(to_date(col("ts")) >= lit(cut))
    Incremental.scd2Merge(spark, t, early, Seq("user_id"), "ts", Seq("event_type"))
    Incremental.scd2Merge(spark, t, late, Seq("user_id"), "ts", Seq("event_type"))
    val settled = history(t)
    // replay of an already-folded batch: every row is at or before each
    // entity's open version, so nothing changes (idempotent restarts)
    Incremental.scd2Merge(spark, t, late, Seq("user_id"), "ts", Seq("event_type"))
    assert(history(t) === settled)
    // genuinely late rows (older than the open version) are dropped, not
    // spliced into closed history — the dbt current-record-only contract
    Incremental.scd2Merge(spark, t, early, Seq("user_id"), "ts", Seq("event_type"))
    assert(history(t) === settled)
  }

  test("NULL tracked states are real versions (null-safe check strategy)") {
    import spark.implicits._
    val t = tmp()
    def merge(rows: Seq[(Long, Option[String], String)]): Unit =
      Incremental.scd2Merge(spark, t, rows.toDF("k", "state", "ts"),
        keys = Seq("k"), updatedAt = "ts", checkCols = Seq("state"))
    merge(Seq((1L, None, "t1"), (2L, Some("x"), "t1")))  // NULL opens k=1
    merge(Seq((1L, None, "t2"), (2L, None, "t2")))       // NULL==NULL suppressed; x->NULL changes
    merge(Seq((1L, Some("y"), "t3")))                    // NULL->y changes
    val got = Incremental.read(spark, t)
      .select("k", "state", "valid_from", "valid_to")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getString(2), Option(r.getString(3)))).toSet
    assert(got === Set(
      (1L, None, "t1", Some("t3")),      // first-NULL version, t2 dup suppressed
      (1L, Some("y"), "t3", None),
      (2L, Some("x"), "t1", Some("t2")),
      (2L, None, "t2", None)))
  }

  test("each merge publishes a committed version; history is time-travelable") {
    val t = tmp()
    val batches = Seq(
      changes.filter(to_date(col("ts")) < lit("2024-01-10")),
      changes.filter(to_date(col("ts")) >= lit("2024-01-10")))
    batches.foreach(b =>
      Incremental.scd2Merge(spark, t, b, Seq("user_id"), "ts", Seq("event_type")))
    assert(Incremental.snapshots(spark, t) === Seq("v00000001", "v00000002"))
    // v1 is the batch-1-only history: its open versions are as of batch 1
    val v1Open = Incremental.readVersion(spark, t, 1)
      .filter(col("valid_to").isNull).count()
    assert(v1Open > 0)
    assert(Incremental.readVersion(spark, t, 1).agg(max("valid_from"))
      .first().getTimestamp(0).toString < "2024-01-10")
  }
}
