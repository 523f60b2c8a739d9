package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{TextOps, UnigramLm}

/** Hand-checkable corpora for the corpus-REWRITING dedup operators
  * (ExactSubstr span removal, CCNet line-grain boilerplate removal) and
  * the unigram-LM prune step — the operators whose oracle rows verify
  * hashes at sf0.01 but whose edge semantics (overlap merge, full
  * removal, prune order, essential pieces) need planted cases. */
class RewriteDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docsOf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("substringDedup keeps the canonical occurrence, rewrites the rest") {
    val d = docsOf(
      1L -> "a b c d e",       // canonical home of span "a b c d"
      2L -> "x a b c d y",     // non-canonical occurrence → removed
      3L -> "m n o p m n o p") // WITHIN-doc duplicate of "m n o p"
    val out = TextOps.substringDedup(d, k = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(out(1L) == ((5L, 0L, "a b c d e")), "canonical doc untouched")
    assert(out(2L) == ((6L, 4L, "x y")),
      "the later occurrence's 4 tokens removed")
    assert(out(3L) == ((8L, 4L, "m n o p")),
      "within-doc repeat removed, first kept")
  }

  test("substringDedup merges overlapping duplicated spans in one sweep") {
    val d = docsOf(
      1L -> "a b c d e",
      // spans "a b c d"@1 and "b c d e"@2 are both duplicated (canonical
      // in doc 1) — removal intervals [1,5) ∪ [2,6) must merge to [1,6)
      2L -> "p a b c d e q")
    val out = TextOps.substringDedup(d, k = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((0L, "a b c d e")))
    assert(out(2L) == ((5L, "p q")), "overlapping spans merge, not double-count")
  }

  test("substringDedup: short docs pass through; full removal yields empty text") {
    val d = docsOf(
      1L -> "a b c d",  // canonical
      2L -> "a b c d",  // identical doc: its only span is non-canonical
      3L -> "x y")      // < k tokens: no spans, untouched
    val out = TextOps.substringDedup(d, k = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(out(1L) == ((4L, 0L, "a b c d")))
    assert(out(2L) == ((4L, 4L, "")), "fully-duplicated doc rewrites to empty")
    assert(out(3L) == ((2L, 0L, "x y")))
  }

  test("deltaSubstringDedup: delta-applied union ≡ full recompute on a fresh store") {
    // the nightly premise: every accumulated id precedes every new id.
    // old docs 1–3 carry their own duplicate ("a b c d" canonical in 1,
    // repeated in 2); new docs 10–11 repeat an OLD span ("a b c d" in 10
    // → store veto), repeat a span WITHIN the batch ("q r s t" canonical
    // in 10, repeated in 11), and carry novel text
    val oldDocs = docsOf(
      1L -> "a b c d e",
      2L -> "x a b c d y",
      3L -> "m n o p q")
    val newDocs = docsOf(
      10L -> "u a b c d v q r s t",
      11L -> "w q r s t z")
    val full = TextOps.substringDedup(oldDocs.unionByName(newDocs), k = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val store = TextOps.spanHashStore(oldDocs, k = 4)
    val delta = TextOps.deltaSubstringDedup(newDocs, store, k = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val oldOnly = TextOps.substringDedup(oldDocs, k = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // the delta union IS the full recompute: old rows unchanged by the
    // new batch, new rows identical to the full window's verdicts
    assert(oldOnly === full.filter(_._1 < 10L))
    assert(delta === full.filter(_._1 >= 10L))
    // and the planted cases land: store veto + within-batch canonical
    assert(delta(10L)._3 == "u v q r s t", "store span removed, batch canonical kept")
    assert(delta(11L)._3 == "w z", "within-batch repeat removed")
  }

  test("lineDedup drops corpus-wide boilerplate lines from every document") {
    val d = docsOf(
      1L -> "BOILER\nunique one",
      2L -> "BOILER\nunique two",
      3L -> "BOILER\nunique three",
      4L -> "BOILER",            // all lines boilerplate → empty rewrite
      5L -> "pair\nunique five",
      6L -> "pair\nunique six")  // "pair" in exactly 2 docs: under threshold
    val out = TextOps.lineDedup(d, maxDocs = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(out(1L) == ((2L, 1L, "unique one")),
      "BOILER (4 docs > 2) dropped from every doc")
    assert(out(2L) == ((2L, 1L, "unique two")))
    assert(out(3L) == ((2L, 1L, "unique three")))
    assert(out(4L) == ((1L, 1L, "")), "all-boilerplate doc rewrites to empty")
    assert(out(5L) == ((2L, 0L, "pair\nunique five")),
      "a line in exactly maxDocs docs is KEPT (threshold is strict >)")
    assert(out(6L) == ((2L, 0L, "pair\nunique six")))
  }

  test("lineDedup preserves line order in the rebuilt text") {
    val d = docsOf(
      1L -> "keep1\nDROP\nkeep2\nDROP\nkeep3",
      2L -> "DROP\nother a",
      3L -> "DROP\nother b")
    val out = TextOps.lineDedup(d, maxDocs = 2).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == "keep1\nkeep2\nkeep3")
  }

  test("pruneVocab orders prunes by likelihood loss; single chars never pruned") {
    // "ab" carries twice the corpus weight of "cd": removing it costs
    // more likelihood, so with nPrune = 1 "cd" goes first
    val d = docsOf(1L -> "ab ab cd")
    val out = UnigramLm.pruneVocab(d, maxPieceLen = 2, vocabSize = 10,
      nPrune = 1).collect()
      .map(r => r.getString(0) ->
        (Option(r.get(2)).map(_.asInstanceOf[Double]),
          r.getBoolean(3), r.getBoolean(4))).toMap
    assert(out.keySet == Set("a", "b", "c", "d", "ab", "cd"))
    // single chars: no loss row, essential by construction, never pruned
    Seq("a", "b", "c", "d").foreach { c =>
      assert(out(c)._1.isEmpty && out(c)._2 && !out(c)._3, s"char $c")
    }
    val (Some(lossAb), essAb, prunedAb) = out("ab")
    val (Some(lossCd), essCd, prunedCd) = out("cd")
    assert(!essAb && !essCd,
      "multi-char pieces with char fallback are not essential")
    assert(lossAb > lossCd,
      s"removing the heavier piece must cost more ($lossAb vs $lossCd)")
    assert(prunedCd && !prunedAb, "the cheaper piece is pruned first")
    assert(lossAb > 0 && lossCd > 0, "removing a used piece always costs")
  }

  test("pruneVocab loss matches the closed form on a one-word corpus") {
    // corpus "ab": vocab {a, b, ab}; with seed counts a:1, b:1, ab:1 →
    // p = 1/3 each. z = p_a·p_b + p_ab = 1/9 + 1/3; z_without_ab = 1/9.
    // loss(ab) = 1·(ln z − ln z_q) = ln 4  (z/zq = (1/9+3/9)/(1/9) = 4)
    val d = docsOf(1L -> "ab")
    val row = UnigramLm.pruneVocab(d, maxPieceLen = 2, vocabSize = 10,
      nPrune = 1).filter(col("piece") === "ab").collect().head
    val loss = row.getDouble(2)
    assert(math.abs(loss - math.log(4.0)) < 1e-6,
      s"loss(ab) should be ln 4 = ${math.log(4.0)}, got $loss")
    assert(row.getBoolean(4), "the only candidate is pruned at nPrune = 1")
  }
}
