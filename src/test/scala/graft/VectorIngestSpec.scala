package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Embeddings
import graft.streaming.VectorIngest

/** [[VectorIngest]] — idempotent streaming append into the persisted IVF
  * index: replays and partial-append crashes converge to one posting per
  * vector, and appended vectors are immediately searchable.
  */
class VectorIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def freshIndex(): (String, org.apache.spark.sql.DataFrame) = {
    val dir = Files.createTempDirectory("vec_ingest").toString + "/ivf"
    val all = Tables.embeddings(spark, sf)
    Embeddings.buildIvfIndex(all.filter(col("vec_id") < 30), dir)
    (dir, all)
  }

  private def postingIds(dir: String): Seq[Long] =
    spark.read.parquet(s"$dir/postings").select("vec_id")
      .collect().map(_.getLong(0)).toSeq

  test("replayed batch appends nothing; partial-append replay fills the gap") {
    val (dir, all) = freshIndex()
    val batch = all.filter(col("vec_id") >= 30 && col("vec_id") < 40)
      .select("vec_id", "embedding")
    VectorIngest.applyBatch(batch, dir)
    val after = postingIds(dir)
    assert(after.size == after.distinct.size && after.size == 40)
    // full replay (crash after append, before checkpoint commit)
    VectorIngest.applyBatch(batch, dir)
    assert(postingIds(dir).size == 40)
    // partial-append crash: half the batch already present, replay whole
    val wider = all.filter(col("vec_id") >= 30 && col("vec_id") < 50)
      .select("vec_id", "embedding")
    VectorIngest.applyBatch(wider, dir)
    val done = postingIds(dir)
    assert(done.size == 50 && done.distinct.size == 50)
  }

  test("dedup anti-join partition-prunes the postings scan to the batch's cells") {
    val (dir, all) = freshIndex()
    val routed = Embeddings.routeToIvfCells(spark, dir,
      all.filter(col("vec_id") >= 30 && col("vec_id") < 40)
        .select("vec_id", "embedding")).persist()
    try {
      val batchCells = routed.select("cell").distinct()
        .collect().map(_.getInt(0)).toSet
      val allCells = spark.read.parquet(s"$dir/postings").select("cell").distinct()
        .collect().map(_.getInt(0)).toSet
      assume(batchCells.size < allCells.size,
        "fixture batch must touch a strict subset of cells for pruning to show")
      val unseen = graft.streaming.VectorIngest.unseenOf(routed, dir)
      val postingScans = unseen.queryExecution.sparkPlan.collect {
        case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("postings")) => s
      }
      assert(postingScans.nonEmpty)
      // the scan carries a partition filter on cell …
      val pf = postingScans.map(_.metadata.getOrElse("PartitionFilters", "")).mkString
      assert(pf.contains("cell"), s"no partition filter on the postings scan: $pf")
      // … and the files it selects under that filter are exactly the
      // batch's cells
      val readCells = postingScans.flatMap { s =>
        s.relation.location.listFiles(s.partitionFilters, s.dataFilters)
          .flatMap(_.files.map(_.getPath.toString))
          .flatMap("cell=(\\d+)".r.findFirstMatchIn(_).map(_.group(1).toInt))
      }.toSet
      assert(readCells.subsetOf(batchCells),
        s"postings scan read cells $readCells beyond the batch's $batchCells")
    } finally { routed.unpersist(); () }
  }

  test("streamed vectors are searchable and routing matches the batch append") {
    import spark.implicits._
    val (dir, all) = freshIndex()
    val input = MemoryStream[(Long, Seq[Float])](spark)
    val q = VectorIngest.ingestStream(
      input.toDF().toDF("vec_id", "embedding"), dir, Files.createTempDirectory("ck").toString)
    val rows = all.filter(col("vec_id") >= 30 && col("vec_id") < 45)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    try {
      input.addData(rows.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(postingIds(dir).size == 45)
    // an appended vector serves as a query and finds neighbors
    val res = Embeddings.searchIvfIndex(spark, dir, col("vec_id") === 37L, k = 3)
      .collect()
    assert(res.length == 3)
    // and the index equals a batch-API append of the same rows
    val (dir2, _) = freshIndex()
    Embeddings.appendToIvfIndex(spark, dir2,
      all.filter(col("vec_id") >= 30 && col("vec_id") < 45)
        .select("vec_id", "embedding"))
    val a = spark.read.parquet(s"$dir/postings")
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = spark.read.parquet(s"$dir2/postings")
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a == b)
  }

  test("maintained ingest: planted shift triggers exactly one refresh; search follows; replay idempotent") {
    // larger index base than freshIndex(): stable per-cell affinity
    // baselines need more than a handful of vectors per centroid
    val dir = java.nio.file.Files.createTempDirectory("vec_maint").toString + "/ivf"
    val all = Tables.embeddings(spark, sf)
    Embeddings.buildIvfIndex(all.filter(col("vec_id") < 300), dir)
    import spark.implicits._

    // batch 1 — stationary: held-out vectors from the same distribution.
    // Their routing affinity sits at/above the cells' own baseline
    // (measured ratio ~1.07), so the 0.9 relative threshold passes them.
    val b1 = all.filter(col("vec_id") >= 300 && col("vec_id") < 400)
      .select("vec_id", "embedding")
    assert(!VectorIngest.applyBatchMaintained(b1, 1L, dir, driftThreshold = 0.9),
      "stationary batch must not refresh")
    assert(!new java.io.File(s"$dir/refresh").exists())
    val d1 = spark.read.parquet(s"$dir/drift")
      .select(col("batch_id").cast("long"), col("cell"), col("n_batch"),
        col("batch_affinity"), col("index_affinity"))
    assert(d1.filter(col("batch_id") === 1L).count() > 0,
      "per-batch drift telemetry missing")

    // batch 2 — planted distribution shift: a tight cluster pointing in
    // a direction no stored centroid points (axis 0 dominant; measured
    // affinity ratio ~0.69, well under the 0.9 trigger)
    def shiftedRows(ids: Range) = ids.map { i =>
      (i.toLong, Array.tabulate(64)(d =>
        if (d == 0) 10.0 else 0.001 * ((i + d) % 7)))
    }
    val b2 = shiftedRows(1000 until 1040).toDF("vec_id", "embedding")
    assert(VectorIngest.applyBatchMaintained(b2, 2L, dir, driftThreshold = 0.9),
      "shifted batch must trigger the refresh")
    val refreshed = spark.read.parquet(s"$dir/refresh")
      .select(col("batch_id").cast("long")).distinct().collect().map(_.getLong(0))
    assert(refreshed.toSeq == Seq(2L), s"exactly one refresh expected: ${refreshed.toSeq}")

    // search reflects the rebuilt centroids: a shifted query's neighbors
    // are the other shifted vectors (they now own a cell of their own)
    def topNeighbors() = Embeddings
      .searchIvfIndex(spark, dir, col("vec_id") === 1000L, k = 5, nprobe = 1)
      .collect().map(r => (r.getLong(2), r.getInt(4))).sortBy(_._2).toSeq
    val res = topNeighbors()
    assert(res.size == 5)
    assert(res.forall(_._1 >= 1000L),
      s"shifted query should retrieve shifted vectors, got $res")

    // replay of the triggering batch: postings, refresh log, and search
    // results all unchanged
    val beforeIds = postingIds(dir).sorted
    VectorIngest.applyBatchMaintained(b2, 2L, dir, driftThreshold = 0.9)
    assert(postingIds(dir).sorted == beforeIds, "replay changed the postings")
    val refreshed2 = spark.read.parquet(s"$dir/refresh")
      .select(col("batch_id").cast("long")).distinct().collect().map(_.getLong(0))
    assert(refreshed2.toSeq == Seq(2L), "replay created a second refresh entry")
    assert(topNeighbors() == res, "replay changed search results")

    // batch 3 — more of the (now absorbed) shifted population: the
    // rebuilt centroids represent it, so no second refresh fires
    val b3 = shiftedRows(1100 until 1120).toDF("vec_id", "embedding")
    assert(!VectorIngest.applyBatchMaintained(b3, 3L, dir, driftThreshold = 0.9),
      "post-refresh batch from the shifted population must not re-trigger")
  }
}
