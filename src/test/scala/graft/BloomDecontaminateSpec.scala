package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** The Bloom-prefiltered decontamination path: same answer as the exact
  * broadcast-set path (the contract that makes the sketch safe to deploy),
  * the codegen'd probe actually in the executed plan, and the no-false-
  * negative property of the filter itself.
  */
class BloomDecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def split() = {
    val all = Tables.documents(spark, sf)
    (all.filter(col("doc_id") % 97 =!= 0), all.filter(col("doc_id") % 97 === 0))
  }

  test("bloom path returns exactly the exact-path clean corpus") {
    val (corpus, bench) = split()
    val exact = TextOps.decontaminate(corpus, bench, k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloom = TextOps.decontaminateBloom(corpus, bench, k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bloom == exact)
    assert(exact.nonEmpty)
  }

  test("answer is fpp-invariant: a deliberately lossy filter still confirms exactly") {
    val (corpus, bench) = split()
    val exact = TextOps.decontaminate(corpus, bench, k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // tiny capacity + huge fpp → the sketch saturates with false
    // positives; the confirm join must still pin the exact answer
    val lossy = TextOps.decontaminateBloom(corpus, bench, k = 3,
      expectedShingles = 16, fpp = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(lossy == exact)
  }

  test("the codegen'd probe sits in the executed plan") {
    val (corpus, bench) = split()
    val df = TextOps.decontaminateBloom(corpus, bench, k = 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan.take(2000))
  }

  test("decontaminateAuto flips path on the broadcast threshold; answers agree") {
    val (corpus, bench) = split()
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    def planOf(df: org.apache.spark.sql.DataFrame): String = {
      df.collect(); df.queryExecution.executedPlan.toString
    }
    try {
      spark.conf.set(key, "10MB")
      val exactPath = TextOps.decontaminateAuto(corpus, bench, k = 3)
      assert(!planOf(exactPath).contains("bloom_might_contain"),
        "eval-sized benchmark should take the broadcast-set path")
      spark.conf.set(key, "1") // force "benchmark too big to broadcast"
      val bloomPath = TextOps.decontaminateAuto(corpus, bench, k = 3)
      assert(planOf(bloomPath).contains("bloom_might_contain"),
        "over-threshold benchmark should take the Bloom path")
      assert(
        bloomPath.select("doc_id").collect().map(_.getLong(0)).toSet ==
          exactPath.select("doc_id").collect().map(_.getLong(0)).toSet)
    } finally spark.conf.set(key, prev)
  }

  test("interpreted eval path (no codegen) matches codegen") {
    import spark.implicits._
    val keys = (1L to 200L).map(_ * 31L)
    val df = keys.toDF("h")
    val bytes = graft.functions.BloomMightContain.serialize(
      df.stat.bloomFilter("h", 200, 0.01))
    val probe = (1L to 400L).map(_ * 31L).toDF("h")
      .filter(call_function("bloom_might_contain", col("h"), lit(bytes)))
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "NO_CODEGEN")
      val interpreted = probe.collect().map(_.getLong(0)).toSet
      spark.conf.set(key, prev)
      val codegen = probe.collect().map(_.getLong(0)).toSet
      assert(interpreted == codegen)
      assert(keys.toSet.subsetOf(interpreted), "false negative in interpreted eval")
    } finally spark.conf.set(key, prev)
  }

  test("no false negatives: every inserted key probes true") {
    import spark.implicits._
    val keys = (1L to 1000L).map(_ * 7919L)
    val df = keys.toDF("h")
    val bf = df.stat.bloomFilter("h", 1000, 0.01)
    val bytes = graft.functions.BloomMightContain.serialize(bf)
    val survived = df.filter(
      call_function("bloom_might_contain", col("h"), lit(bytes))).count()
    assert(survived == keys.size)
    // and the sketch is actually selective on disjoint keys
    val misses = (1L to 1000L).map(_ * 7919L + 1L).toDF("h")
      .filter(call_function("bloom_might_contain", col("h"), lit(bytes))).count()
    assert(misses < 100, s"fpp blew past 10x the configured 1%: $misses/1000")
  }
}
