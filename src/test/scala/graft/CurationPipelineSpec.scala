package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.{CurationPipeline, TextOps}

class CurationPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stages compose: monotone shrink, invariants hold at every stage") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val r = CurationPipeline.run(corpus, bench)
    val audit = r.audit.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // the funnel only shrinks, and nothing vanishes entirely
    val order = Seq("0_input", "1_gated", "2_exact_dedup", "3_near_dedup",
      "4_decontaminated")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(audit(a) >= audit(b), s"$b grew past $a")
    }
    assert(audit("4_decontaminated") > 0)
    // stage-1 per-gate rejection rows exist for every registered gate,
    // and the gated count is consistent with them: at least
    // input − Σrejects survive (counts are non-exclusive), and no
    // single gate alone rejects more than the total gated away
    val gateNames = Seq("quality", "lang", "repetition", "gopher", "c4")
    val rejects = gateNames.map(g => audit(s"1_reject_$g"))
    assert(audit("1_gated") >= audit("0_input") - rejects.sum)
    rejects.zip(gateNames).foreach { case (n, g) =>
      assert(n <= audit("0_input") - audit("1_gated"),
        s"gate $g rejects more than the stage total")
    }

    val curated = r.curated.cache()
    try {
      assert(curated.count() == audit("4_decontaminated"))
      // no exact duplicates survive
      val dupGroups = curated
        .groupBy(md5(TextOps.normalized(col("text")))).count()
        .filter(col("count") > 1).count()
      assert(dupGroups == 0, "exact duplicates survived curation")
      // split assignment is total and deterministic
      val splits = curated.groupBy("split").count().collect()
        .map(x => x.getString(0) -> x.getLong(1)).toMap
      assert(splits.keySet.subsetOf(Set("train", "val", "test")))
      assert(splits.values.sum == audit("4_decontaminated"))
      // no contaminated doc survives: re-checking hits on the curated set
      // against the benchmark finds nothing
      assert(TextOps.contaminationHits(curated, bench, k = 8).count() == 0)
    } finally { curated.unpersist(); r.unpersist() }
  }

  test("stage 1.5 drops all-boilerplate docs and recomputes n_chars from the rewritten text") {
    import spark.implicits._
    val sfDocs = Tables.documents(spark, "/root/testdata/sf0.001")
    val base = CurationPipeline.run(sfDocs, sfDocs.limit(0))
    val rows = base.curated.select("text", "lang", "source")
      .as[(String, String, String)].head(50)
    base.unpersist()
    val a = rows.head
    val b = rows.find(_._1.split(" ").head != a._1.split(" ").head).get
    // four gate-passing docs sharing their (single) line: with
    // lineMaxDocs = 3 the line is corpus-wide boilerplate, all four
    // rewrite to EMPTY and must be dropped at stage 1.5 — an empty doc
    // must never ride into the curated corpus past gates that only saw
    // the pre-rewrite text
    val corpus = (Seq.tabulate(4)(i => (800000L + i, a._1, a._2, a._3)) :+
      ((800010L, b._1, b._2, b._3)))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val r = CurationPipeline.run(corpus, corpus.limit(0))
    val audit = r.audit.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val curated = r.curated.collect()
    r.unpersist()
    assert(audit("1_gated") == 5, "all five docs pass the gates")
    assert(audit("1z_line_dedup_dropped_empty") == 4,
      "the four empty rewrites must be accounted for in the funnel")
    assert(curated.map(_.getAs[Long]("doc_id")).toSet == Set(800010L),
      "all-boilerplate docs must be dropped, the distinct doc kept")
    // n_chars tracks the REWRITTEN text for every curated doc
    curated.foreach { row =>
      assert(row.getAs[Long]("n_chars") ==
        row.getAs[String]("text").length.toLong,
        s"n_chars stale for doc ${row.getAs[Long]("doc_id")}")
    }
  }

  test("gopher and c4 gates reject planted documents the original three gates pass") {
    import spark.implicits._
    val sfDocs = Tables.documents(spark, "/root/testdata/sf0.001")
    // a survivor of the full sf pipeline: its (text, lang) pass every
    // stage-1 gate, so it anchors planted variants that fail exactly one
    val base = CurationPipeline.run(sfDocs, sfDocs.limit(0))
    val ok = base.curated.select("text", "lang", "source")
      .as[(String, String, String)].head()
    base.unpersist()
    // gopher-only failure: one 40-hash token pushes hash_ratio (substring
    // count / n_words) past 0.1 while leaving quality (n_tokens),
    // lang (marker votes), repetition (no token run), and c4 (no brace,
    // kept lines unchanged) untouched.
    // c4-only failure: a curly brace — the code filter — touches no
    // other signal.
    val hashed = ok._1 + " " + ("#" * 40)
    val braced = ok._1 + " {x"
    val corpus = Seq(
      (900001L, ok._1), (900002L, hashed), (900003L, braced))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit(ok._2).as("lang"),
        lit(ok._3).as("source"), length(col("text")).cast("long").as("n_chars"))
    val r = CurationPipeline.run(corpus, corpus.limit(0))
    val audit = r.audit.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val kept = r.curated.select("doc_id").as[Long].collect().toSet
    r.unpersist()
    assert(kept.contains(900001L), "control doc should survive")
    assert(!kept.contains(900002L), "hash-heavy doc must fail the gopher gate")
    assert(!kept.contains(900003L), "braced doc must fail the c4 gate")
    assert(audit("1_reject_gopher") >= 1)
    assert(audit("1_reject_c4") >= 1)
    // and they fail ONLY their own gate
    assert(audit("1_reject_quality") == 0)
    assert(audit("1_reject_lang") == 0)
    assert(audit("1_reject_repetition") == 0)
  }
}
