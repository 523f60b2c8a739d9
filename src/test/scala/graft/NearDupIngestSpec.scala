package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.NearDupIngest

/** Streaming near-dup ingest: batch-local banded dedup, persisted-store
  * veto across batches, and replay idempotence — the exactly-once
  * contract CorpusIngest pins, lifted to NEAR duplicates. */
class NearDupIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("neardup").toString

  private val base =
    "the quick brown fox jumps over the lazy dog near the old river bank today"
  // same text with ONE interior token changed — shingle overlap stays high
  private val nearDup =
    "the quick brown fox jumps over the lazy cat near the old river bank today"
  private val distinct =
    "completely different subject matter discussing spark structured streaming watermarks and state stores"

  test("near-dup of an in-batch doc is rejected; novel docs admitted") {
    val corpus = tmp(); val store = tmp()
    val b1 = Seq((1L, base, "s1"), (2L, nearDup, "s1"), (3L, distinct, "s2"))
      .toDF("doc_id", "text", "source")
    val (admitted, rejected) = NearDupIngest.applyBatch(b1, 0L, corpus, store)
    assert((admitted, rejected) == ((2L, 1L)))
    val kept = spark.read.parquet(s"$corpus/documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L)) // the EARLIER member of the pair survives
  }

  test("near-dup of a PERSISTED doc is vetoed in a later batch; replay is a no-op") {
    val corpus = tmp(); val store = tmp()
    val b1 = Seq((1L, base, "s1")).toDF("doc_id", "text", "source")
    assert(NearDupIngest.applyBatch(b1, 0L, corpus, store) == ((1L, 0L)))
    val b2 = Seq((10L, nearDup, "s3"), (11L, distinct, "s3"))
      .toDF("doc_id", "text", "source")
    assert(NearDupIngest.applyBatch(b2, 1L, corpus, store) == ((1L, 1L)))
    val kept = spark.read.parquet(s"$corpus/documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 11L))
    // replayed batch id: marker makes it a no-op, corpus unchanged
    assert(NearDupIngest.applyBatch(b2, 1L, corpus, store) == ((0L, 0L)))
    assert(spark.read.parquet(s"$corpus/documents").count() == 2)
  }

  test("short unshingleable docs are admitted, not crashed on") {
    val corpus = tmp(); val store = tmp()
    val b = Seq((1L, "hi there", "s1"), (2L, base, "s1"))
      .toDF("doc_id", "text", "source")
    assert(NearDupIngest.applyBatch(b, 0L, corpus, store) == ((2L, 0L)))
  }

  test("streaming wiring: two micro-batches through the sink") {
    val corpus = tmp(); val store = tmp(); val ckpt = tmp()
    val input = MemoryStream[(Long, String, String)](spark)
    val q = NearDupIngest.stream(
      input.toDF().toDF("doc_id", "text", "source"), corpus, store, ckpt)
    try {
      input.addData((1L, base, "s1"))
      q.processAllAvailable()
      input.addData((2L, nearDup, "s2"), (3L, distinct, "s2"))
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$corpus/documents")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L))
    } finally q.stop()
  }
}
