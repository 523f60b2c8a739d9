package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.BudgetIngest
import graft.streaming.BudgetIngest.BudgetDoc
import graft.text.TextOps

/** Stream == batch for token-budget admission: the batch sampler is a
  * per-stratum prefix-sum cutoff in salted-hash order; the stream applies
  * the identical prefix rule with one long of state per stratum. Feeding
  * the corpus as hash-ordered micro-batch slices must reproduce the batch
  * answer row for row — including the property that a rejected doc still
  * burns budget (window cutoff, not knapsack). */
class BudgetIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed admission across 3 micro-batches == batch budgetSample") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val budget = 800L

    val batchExpected = TextOps.budgetSample(docs, budget)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap // doc_id -> cum

    // the same (source, n_tokens, h) projection the batch sampler uses,
    // globally hash-ordered then sliced — per source, arrival order is a
    // subsequence of the sorted order, so prefix sums line up
    val feed = TextOps.tokenized(docs)
      .select(col("source"), col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        TextOps.md5Long(concat(lit("budget:"), col("doc_id").cast("string")))
          .as("h"))
      .orderBy("h", "doc_id")
      .as[BudgetDoc].collect()
    val slices = feed.grouped(math.max(1, feed.length / 3 + 1)).toSeq

    val input = MemoryStream[BudgetDoc](spark)
    val q = BudgetIngest.budgetStream(input.toDS(), budget)
      .writeStream.format("memory").queryName("budget_stream")
      .outputMode("append").start()
    try {
      slices.foreach { s => input.addData(s.toIndexedSeq); q.processAllAvailable() }
      val streamed = spark.table("budget_stream")
        .collect().map(r => (r.getLong(1), r.getLong(3))).toMap
      assert(streamed == batchExpected,
        s"stream ${streamed.size} rows vs batch ${batchExpected.size}")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
