package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint

/** The size gate that keeps pinned broadcasts from becoming 100×-scale
  * OOMs (graft.ops.AutoBroadcast): small side → pinned broadcast hint
  * (the deterministic local plan), side over the session threshold → no
  * hint, so the join plans as shuffle. The near-dup pair join is the
  * operator the r2 audit called out, so it gets the end-to-end plan
  * assertion in both regimes.
  */
class AutoBroadcastSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val Threshold = "spark.sql.autoBroadcastJoinThreshold"

  private def docs = graft.Tables.documents(spark, sf)

  private def withThreshold[A](v: String)(body: => A): A = {
    val prev = spark.conf.get(Threshold)
    spark.conf.set(Threshold, v)
    try body finally spark.conf.set(Threshold, prev)
  }

  private def hasHint(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.nonEmpty

  test("sizeGate pins a broadcast hint on a side under the threshold") {
    assert(hasHint(graft.ops.AutoBroadcast.sizeGate(docs)))
  }

  test("sizeGate declines the hint once the side exceeds the threshold") {
    withThreshold("1KB") {
      assert(!hasHint(graft.ops.AutoBroadcast.sizeGate(docs)))
    }
  }

  test("threshold -1 (broadcast disabled) never pins") {
    withThreshold("-1") {
      assert(!hasHint(graft.ops.AutoBroadcast.sizeGate(docs)))
    }
  }

  test("threshold parses bare-byte and unit forms") {
    withThreshold("1048576") {
      assert(graft.ops.AutoBroadcast.thresholdBytes(docs) === 1048576L)
    }
    withThreshold("10MB") {
      assert(graft.ops.AutoBroadcast.thresholdBytes(docs) === 10L * 1024 * 1024)
    }
  }

  test("nearDupPairs plans a broadcast pair join on a small corpus") {
    val plan = graft.text.TextOps.nearDupPairs(docs)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("nearDupPairs flips the pair join to shuffle on a big corpus") {
    // 1 KB threshold stands in for "corpus larger than an executor":
    // the same measured-size gate that pins locally must decline here.
    withThreshold("1KB") {
      val plan = graft.text.TextOps.nearDupPairs(docs)
        .queryExecution.sparkPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("BroadcastHashJoin"), plan)
    }
  }

  test("nearDupPairs answers are identical in both regimes") {
    val pinned = graft.text.TextOps.nearDupPairs(docs, broadcastPairs = Some(true))
      .orderBy("doc_id_a", "doc_id_b").collect()
    val shuffled = withThreshold("1KB") {
      graft.text.TextOps.nearDupPairs(docs)
        .orderBy("doc_id_a", "doc_id_b").collect()
    }
    assert(pinned.toSeq === shuffled.toSeq)
  }
}
