package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.mars.{MarsPipeline, Warehouse}
import graft.streaming.{ControlPlane, Orchestrator}

/** End-to-end test of the closed feedback loop (SURVEY §3 EP1→EP2→EP3):
  * seeded uploads → bronze load → silver/gold build → gap detection →
  * scheduled ingestion → re-load → gaps drained.
  */
class OrchestratorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Copy a fixture bronze doc into the object store under its routed
    * prefix, returning the object key (simulates the reference's seeded
    * MinIO uploads). */
  private def seed(objectStore: String, fixtureFile: String): String = {
    val src = Paths.get(MarsPipeline.defaultFixtureDir, fixtureFile)
    val line = Files.readString(src).trim
    val fn = """"filename": "([^"]+)"""".r.findFirstMatchIn(line).get.group(1)
    val prefix = graft.mars.RoverKeys.route(fn)
    val dir = Paths.get(objectStore, prefix)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(fn), line + "\n")
    s"$prefix/$fn"
  }

  private def mkOrchestrator(tag: String): (Orchestrator, Warehouse, String, String) = {
    val root = Files.createTempDirectory(s"graft_orch_$tag").toString
    val topics = s"$root/topics"
    val store = s"$root/store"
    val wh = Warehouse(spark, s"$root/warehouse")
    val clock = () => java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"))
    (Orchestrator(spark, topics, store, wh, clock), wh, topics, store)
  }

  test("batch orchestration closes the loop and drains the gap queue") {
    val (orch, wh, topics, store) = mkOrchestrator("batch")
    val keys = Seq("photos.jsonl", "manifests.jsonl", "coordinates.jsonl")
      .map(seed(store, _))

    orch.loadStage(keys)
    assert(ControlPlane.readTopicBatch(spark, topics, ControlPlane.TopicLoadComplete)
      .count() == 3)

    val sched = orch.transformStage()
    assert(sched.tasks.map(t => (t.rover_name, t.sol)).toSet ==
      Set(("Perseverance", 51), ("Curiosity", 2), ("Opportunity", 101), ("Spirit", 200)))
    assert(sched.sol_range == (2 to 200))

    val newKey = orch.ingestStage(sched.tasks, sched.sol_range)
    assert(newKey.isDefined && newKey.get.startsWith("photos/"))

    // loop re-entry: load the fresh batch, rebuild → queue drains
    orch.loadStage(Seq(newKey.get))
    val sched2 = orch.transformStage()
    assert(sched2.tasks.isEmpty, s"expected drained gap queue, got ${sched2.tasks}")
    assert(wh.validationPhotoGaps.count() == 0)

    // gold marts materialized and incremental (second build appended nothing stale)
    assert(spark.read.parquet(wh.goldDailyActivity).count() > 0)
    assert(spark.read.parquet(wh.goldCameraTravel)
      .filter(col("sol_number") === 51).count() > 0) // ingested gap sol reached gold
  }

  test("streaming orchestration: three foreachBatch stages wire the same loop") {
    val (orch, wh, topics, store) = mkOrchestrator("stream")
    val queries = orch.startAll()
    try {
      Seq("photos.jsonl", "manifests.jsonl", "coordinates.jsonl").foreach { f =>
        val key = seed(store, f)
        ControlPlane.produce(topics, ControlPlane.TopicMinioEvents,
          ControlPlane.minioEventJson(key))
      }
      // drive micro-batches until the loop quiesces:
      // events→load, complete→transform(schedule), schedule→ingest(event),
      // event→load, complete→transform(no gaps)
      val Seq(load, transform, ingest) = queries
      var spins = 0
      var drained = false
      while (!drained && spins < 6) {
        load.processAllAvailable()
        transform.processAllAvailable()
        ingest.processAllAvailable()
        spins += 1
        drained = spins >= 2 && wh.validationPhotoGaps.count() == 0
      }
      assert(drained, s"gap queue not drained after $spins loop spins")
      // at-least-once: every load-complete micro-batch triggers a transform,
      // so the same gap schedule may be re-emitted until ingestion lands —
      // reference behavior (each Kafka msg triggers a full dbt DAG run)
      val nSched = ControlPlane.readTopicBatch(spark, topics,
        ControlPlane.TopicScheduling).count()
      assert(nSched >= 1, s"unexpected scheduling count $nSched")
      assert(spark.read.parquet(wh.goldDailyActivity).count() > 0)
    } finally queries.foreach(_.stop())
  }

  test("streaming stage resumes from its checkpoint without reprocessing") {
    val (orch, _, topics, store) = mkOrchestrator("resume")
    val q1 = orch.startLoadStream()
    try {
      val key1 = seed(store, "manifests.jsonl")
      ControlPlane.produce(topics, ControlPlane.TopicMinioEvents,
        ControlPlane.minioEventJson(key1))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(ControlPlane.readTopicBatch(spark, topics,
      ControlPlane.TopicLoadComplete).count() == 1)

    // an event arrives while the stage is down
    val key2 = seed(store, "coordinates.jsonl")
    ControlPlane.produce(topics, ControlPlane.TopicMinioEvents,
      ControlPlane.minioEventJson(key2))

    // restart: only the new event is processed (checkpoint skips the old)
    val q2 = orch.startLoadStream()
    try q2.processAllAvailable() finally q2.stop()
    assert(ControlPlane.readTopicBatch(spark, topics,
      ControlPlane.TopicLoadComplete).count() == 2,
      "restart must process exactly the one missed event")
  }

  test("topic value parsing: per-topic extraction incl. URL-decoded keys") {
    import spark.implicits._
    val df = Seq("""{"Key":"photos/mars%20rover.json","EventName":"s3:ObjectCreated:Put"}""")
      .toDF("value")
    val key = df.select(ControlPlane.parseValue(ControlPlane.TopicMinioEvents,
      col("value")).as("k")).first().getString(0)
    assert(key == "photos/mars rover.json")

    val sdf = Seq(
      """{"status":"success","timestamp":"t","ingestion_schedule":{"tasks":[{"rover_name":"Spirit","sol":7}],"sol_range":[7]}}""")
      .toDF("value")
    val s = sdf.select(ControlPlane.parseValue(ControlPlane.TopicScheduling,
      col("value")).as("s")).first().getStruct(0)
    assert(s.getSeq[org.apache.spark.sql.Row](0).head.getString(0) == "Spirit")
  }
}
