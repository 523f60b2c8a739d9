package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CorpusIngest

class CorpusIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp() = Files.createTempDirectory("corpus_ingest").toString

  test("stream dedups against the persisted store across micro-batches") {
    import spark.implicits._
    val corpus = tmp(); val store = tmp(); val ckpt = tmp()
    val input = MemoryStream[(Long, String)](spark)
    val q = CorpusIngest.stream(
      input.toDF().toDF("doc_id", "text"), corpus, store, ckpt)
    try {
      // batch 0: a dup INSIDE the batch (2 copies of "alpha") + one unique
      input.addData((1L, "alpha doc"), (2L, "alpha doc"), (3L, "beta doc"))
      q.processAllAvailable()
      // batch 1: replays old content by VALUE (new ids) + one novel doc
      input.addData((4L, "alpha doc"), (5L, "beta doc"), (6L, "gamma doc"))
      q.processAllAvailable()
      val docs = spark.read.parquet(s"$corpus/documents")
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(docs == Set((1L, "alpha doc"), (3L, "beta doc"), (6L, "gamma doc")),
        s"got $docs")
      val fps = spark.read.parquet(s"$store/fingerprints").count()
      assert(fps == 3)
    } finally q.stop()
  }

  test("replaying the same batch id is a no-op (marker idempotence)") {
    import spark.implicits._
    val corpus = tmp(); val store = tmp()
    val batch = Seq((1L, "one doc"), (2L, "two doc")).toDF("doc_id", "text")
    val first = CorpusIngest.applyBatch(batch, batchId = 7, corpus, store)
    assert(first == (2L, 0L))
    val replay = CorpusIngest.applyBatch(batch, batchId = 7, corpus, store)
    assert(replay == (0L, 0L))
    assert(spark.read.parquet(s"$corpus/documents").count() == 2)
    // a NEW batch with the same content dedups via the store, not the marker
    val next = CorpusIngest.applyBatch(batch, batchId = 8, corpus, store)
    assert(next == (0L, 2L))
    assert(spark.read.parquet(s"$corpus/documents").count() == 2)
  }
}
