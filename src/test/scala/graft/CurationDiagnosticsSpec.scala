package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps
import graft.sim.Embeddings

/** Corpus-level curation diagnostics: per-source n-gram diversity, the
  * one-scan length-gate sweep, and the within-cell cosine histogram —
  * each pinned on hand-built inputs with known answers.
  */
class CurationDiagnosticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docDF(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))

  test("ngramDiversity: repeated trigrams lower the ratio; unique text scores 1.0") {
    val df = docDF(
      // "a b c" repeated: 4 instances of trigrams, 3 distinct ("a b c","b c a","c a b")
      (1L, "a b c a b c", "tpl"),
      // 2 instances, both distinct
      (2L, "p q r s", "uniq"))
    val m = TextOps.ngramDiversity(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(m("tpl") == ((4L, 3L, 0.75)))
    assert(m("uniq") == ((2L, 2L, 1.0)))
  }

  test("ngramDiversity: sub-k-token docs contribute zero instances") {
    val df = docDF((1L, "a b", "s"), (2L, "x", "s"))
    val r = TextOps.ngramDiversity(df).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 0L && r.head.getLong(2) == 0L)
    assert(r.head.isNullAt(3)) // 0/0 guarded to NULL, not Inf/NaN
  }

  test("qualitySweep: one row per threshold, keep counts monotone non-increasing") {
    val df = docDF(
      (1L, Seq.fill(10)("w").mkString(" "), "s"),
      (2L, Seq.fill(25)("w").mkString(" "), "s"),
      (3L, Seq.fill(45)("w").mkString(" "), "s"),
      (4L, Seq.fill(90)("w").mkString(" "), "s"))
    val rows = TextOps.qualitySweep(df, Seq(20, 40, 60, 80))
      .orderBy("min_tokens").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(20, 40, 60, 80))
    val kept = rows.map(_.getLong(1)).toSeq
    assert(kept == Seq(3L, 2L, 1L, 1L))
    assert(kept.zip(kept.drop(1)).forall { case (a, b) => a >= b })
    // rates are count/total over the same scan
    assert(rows.map(_.getDouble(2)).toSeq == Seq(0.75, 0.5, 0.25, 0.25))
    // token keep-rate: 170 total tokens; >=20 keeps 160, >=40 keeps 135, >=60/80 keep 90
    assert(rows.map(_.getLong(3)).toSeq == Seq(160L, 135L, 90L, 90L))
  }

  test("cosineHistogram: bin counts cover every within-cell pair exactly once") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 0), // identical to 1 → cosine 1.0 → bin 10
      (3L, Array(0.0f, 1.0f), 0), // orthogonal → bin 0
      (4L, Array(-1.0f, 0.0f), 1),
      (5L, Array(1.0f, 0.0f), 1) // opposite → cosine -1.0 → bin -10
    ).toDF("vec_id", "embedding", "label")
    val h = Embeddings.cosineHistogram(emb).collect()
      .map(r => r.getInt(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // cell 0 pairs: (1,2)=1.0→bin10, (1,3)=0→bin0, (2,3)=0→bin0; cell 1: (4,5)=-1→bin-10
    assert(h(10) == ((1L, 0.25)))
    assert(h(0) == ((2L, 0.5)))
    assert(h(-10) == ((1L, 0.25)))
    assert(h.values.map(_._1).sum == 4L)
    assert(math.abs(h.values.map(_._2).sum - 1.0) < 1e-9)
  }

  test("gopherRepetition: hand-computed top/dup n-gram character fractions") {
    // "a b a b a b c" — 2-grams: "a b"x3, "b a"x2, "b c"x1.
    // top 2-gram = "a b" (3 occurrences, 3 chars) -> 9/13 chars.
    // 3-grams: "a b a"x2, "b a b"x2, "a b c"x1 -> top = 2*5 = 10 chars
    // ("a b a" wins the count tie as the smaller gram, same length).
    val d = docDF((1L, "a b a b a b c", "s1"))
    val r = TextOps.gopherRepetition(d).collect()(0)
    val byName = r.schema.fieldNames.zipWithIndex.toMap
    def f(n: String) = r.getDouble(byName(n))
    val nChars = 13.0
    assert(f("top_2gram_char_frac") == math.rint(9 / nChars * 1e6) / 1e6)
    assert(f("top_3gram_char_frac") == math.rint(10 / nChars * 1e6) / 1e6)
    // repetitious doc: fails the battery (top 2-gram frac 0.69 >> 0.20)
    assert(r.getInt(byName("pass_gopher_rep")) == 0)

    // planted duplicated 5-grams: "x y z w v" cycled 3x (15 tokens,
    // 29 chars). 5-gram rotations: rotation 0 occurs 3x, rotations 1-4
    // occur 2x, every gram is 9 chars ->
    // dup = 3*9 + 4*(2*9) = 99 (overlapping occurrences each counted,
    // exactly as the rule defines — fractions may exceed 1)
    val d5 = docDF((3L, "x y z w v x y z w v x y z w v", "s1"))
    val r5 = TextOps.gopherRepetition(d5).collect()(0)
    val b5 = r5.schema.fieldNames.zipWithIndex.toMap
    assert(r5.getDouble(b5("dup_5gram_char_frac")) ==
      math.rint(99 / 29.0 * 1e6) / 1e6)
    assert(r5.getInt(b5("pass_gopher_rep")) == 0)

    // a non-repetitious doc passes: all grams unique -> dup = 0, and the
    // doc is long enough that a single n-gram covers < 16% of its chars
    // (the rule legitimately fails very short documents)
    val clean = docDF((2L,
      (1 to 30).map(i => f"tok$i%02d").mkString(" "), "s1"))
    val c = TextOps.gopherRepetition(clean).collect()(0)
    val cn = c.schema.fieldNames.zipWithIndex.toMap
    Seq(5, 6, 7, 8, 9, 10).foreach { n =>
      assert(c.getDouble(cn(s"dup_${n}gram_char_frac")) == 0.0)
    }
    assert(c.getInt(cn("pass_gopher_rep")) == 1)
  }
}
