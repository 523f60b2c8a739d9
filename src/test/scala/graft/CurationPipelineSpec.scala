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
}
