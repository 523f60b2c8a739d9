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
}
