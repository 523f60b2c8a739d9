package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** r5 incremental-curation operators: delta near-dup (new slice vs
  * settled corpus), snapshot diff audit, and the LSH banding planner.
  */
class DeltaOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("deltaNearDupPairs finds new-vs-old pairs and excludes old×old and new×new") {
    import spark.implicits._
    val docs = Seq(
      // old near-dup cluster (both old — must NOT appear)
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      // new doc near-duplicating an old doc — MUST appear
      (10L, "the quick brown fox jumps over the lazy dog tonight ok"),
      // two near-identical new docs (both new — must NOT appear)
      (20L, "completely different words appear here in this new entry"),
      (30L, "completely different words appear here in this new entry now"),
      // unrelated old doc
      (3L, "unrelated content about mars rovers and their cameras"))
      .toDF("doc_id", "text")
    val got = TextOps.deltaNearDupPairs(docs, col("doc_id") >= 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((10L, 1L)), s"missing new-vs-old pair: $got")
    got.foreach { case (n, o) =>
      assert(n >= 10L && o < 10L, s"pair ($n,$o) crosses the wrong sides")
    }
    // parity with the full-corpus operator: every delta pair is also a
    // full-corpus candidate pair (as (min,max)) with the same jaccard
    val full = TextOps.lshCandidatePairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got.foreach { case (n, o) =>
      assert(full.contains((math.min(n, o), math.max(n, o))),
        s"delta pair ($n,$o) absent from the full candidate set")
    }
  }

  test("snapshotDiff classifies added/removed/changed/unchanged per source") {
    import spark.implicits._
    val prev = Seq(
      (1L, "s1", "alpha"), (2L, "s1", "beta"), (3L, "s2", "gamma"),
      (9L, "s2", "ghost"))
      .toDF("doc_id", "source", "text")
    val cur = Seq(
      (1L, "s1", "alpha"),          // unchanged
      (2L, "s1", "beta prime"),     // changed
      (3L, "s2", "gamma"),          // unchanged
      (4L, "s2", "delta"))          // added
      .toDF("doc_id", "source", "text")
    val got = TextOps.snapshotDiff(prev.select("doc_id", "text", "source"),
      cur.select("doc_id", "text", "source"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("s1") == ((0L, 0L, 1L, 1L)))  // added, removed, changed, unchanged
    assert(got("s2") == ((1L, 1L, 0L, 1L)))
  }

  test("lshBandingPlan: S-curves are monotone in j and band count trades recall for cost") {
    val rows = TextOps.lshBandingPlan(spark).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    val byPlan = rows.groupBy(_._1)
    assert(byPlan.keySet == Set((1, 16), (2, 8), (4, 4), (8, 2), (16, 1)))
    byPlan.values.foreach { pts =>
      val sorted = pts.sortBy(_._2)
      // p_candidate nondecreasing in jaccard
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a._3 <= b._3, s"S-curve not monotone: $a -> $b")
      }
      // one characteristic threshold per plan, inside (0,1]
      assert(pts.map(_._4).distinct.size == 1)
      assert(pts.head._4 > 0 && pts.head._4 <= 1)
    }
    // more bands (finer) => higher candidate probability at LOW jaccard
    def pAt(plan: (Int, Int), j: Double) =
      byPlan(plan).find(p => math.abs(p._2 - j) < 1e-9).get._3
    assert(pAt((16, 1), 0.25) > pAt((4, 4), 0.25))
    assert(pAt((4, 4), 0.25) > pAt((1, 16), 0.25))
    // and the characteristic threshold falls as bands rise
    assert(byPlan((16, 1)).head._4 < byPlan((4, 4)).head._4)
    assert(byPlan((4, 4)).head._4 < byPlan((1, 16)).head._4)
  }
}
