package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** The distributed BPE training loop vs a sequential reference
  * implementation of the same algorithm (pair-count argmax with
  * (count desc, a, b) tie-break; left-to-right non-overlapping merge),
  * plus the encode-side invariants that make the merge table a usable
  * tokenizer artifact.
  */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def mergeLR(syms: List[String], a: String, b: String): List[String] = {
    val buf = mutable.ArrayBuffer[String]()
    syms.foreach { s =>
      if (buf.nonEmpty && buf.last == a && s == b) buf(buf.size - 1) = a + b
      else buf += s
    }
    buf.toList
  }

  private def refBpe(wordCounts: Map[String, Long], nMerges: Int,
                     minPair: Long): List[(Int, String, String, String, Long)] = {
    var words = wordCounts.toList.map { case (w, n) => (w.split("").toList, n) }
    val out = mutable.ListBuffer[(Int, String, String, String, Long)]()
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val counts = mutable.Map[(String, String), Long]().withDefaultValue(0L)
      words.foreach { case (syms, n) =>
        syms.zip(syms.drop(1)).foreach(p => counts(p) += n)
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toList.minBy { case ((a, b), c) => (-c, a, b) }
        if (c < minPair) done = true
        else {
          out += ((rank, a, b, a + b, c))
          words = words.map { case (syms, n) => (mergeLR(syms, a, b), n) }
          rank += 1
        }
      }
    }
    out.toList
  }

  test("distributed loop reproduces the sequential reference merge table") {
    val docs = Tables.documents(spark, sf)
    val wc = TextOps.tokenized(docs)
      .select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = refBpe(wc, nMerges = 8, minPair = 2)
    val got = TextOps.bpeTrain(docs, nMerges = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toList
    assert(got == expect)
    assert(got.size == 8, s"corpus should support 8 merges, got ${got.size}")
  }

  test("encoding with the merge table preserves content and compresses") {
    val docs = Tables.documents(spark, sf)
    val merges = TextOps.bpeTrain(docs, nMerges = 8).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val words = TextOps.tokenized(docs)
      .select(explode(col("toks")).as("word")).distinct()
    val encoded = merges.foldLeft(
      words.withColumn("syms", split(col("word"), ""))) { case (df, (a, b)) =>
      df.withColumn("syms", TextOps.bpeMergeOnce(col("syms"), a, b))
    }
    val rows = encoded
      .select(col("word"), concat_ws("", col("syms")).as("rejoined"),
        size(col("syms")).as("n_syms"), length(col("word")).as("n_chars"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(0), s"lossy encode: $r")
      assert(r.getInt(2) <= r.getInt(3), s"encode grew: $r")
    }
    // the merges must actually compress the corpus's own vocabulary
    assert(rows.exists(r => r.getInt(2) < r.getInt(3)))
  }

  test("merge loop stops when no pair clears the support floor") {
    val docs = Tables.documents(spark, sf)
    val all = TextOps.bpeTrain(docs, nMerges = 1000, minPairCount = 500)
    assert(all.count() < 1000)
  }

  test("bpeEncode matches the sequential per-doc fold") {
    val docs = Tables.documents(spark, sf)
    val merges = TextOps.bpeTrain(docs, nMerges = 8).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val subset = docs.filter(col("doc_id") < 50)
    val got = TextOps.bpeEncode(subset, merges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expect = subset.select("doc_id", "text").collect().map { r =>
      val toks = r.getString(1).split(" ")
      val pieces = toks.map { w =>
        merges.foldLeft(w.split("").toList) { case (syms, (a, b)) =>
          mergeLR(syms, a, b)
        }.size.toLong
      }.sum
      r.getLong(0) -> (toks.length.toLong, pieces)
    }.toMap
    assert(got == expect)
  }
}
