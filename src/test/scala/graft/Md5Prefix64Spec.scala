package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextOps

class Md5Prefix64Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native md5_prefix64 == built-ins composition, row for row") {
    val df = (Seq("", "a", "abc", "hello world", "0:some shingle text") ++
      (1 to 500).map(i => s"doc $i content with words $i")).toDF("s")
    val mismatches = df.select(
      TextOps.md5Long(col("s")).as("native"),
      TextOps.md5LongPortable(col("s")).as("portable"))
      .filter(col("native") =!= col("portable"))
      .count()
    assert(mismatches == 0)
  }

  test("known value: first 15 hex chars of md5('abc')") {
    // md5('abc') = 900150983cd24fb0... → 0x900150983cd24fb
    val v = Seq("abc").toDF("s")
      .select(TextOps.md5Long(col("s"))).first().getLong(0)
    assert(v == java.lang.Long.parseLong("900150983cd24fb", 16))
  }

  test("binary input hashes the raw bytes (same as the equivalent string)") {
    val df = Seq("media bytes here").toDF("s")
      .select(
        TextOps.md5Long(col("s")).as("from_string"),
        call_function("md5_prefix64", col("s").cast("binary")).as("from_binary"))
    val r = df.first()
    assert(r.getLong(0) == r.getLong(1))
  }

  test("null-safe and non-negative") {
    val df = Seq(Some("x"), None).toDF("s")
      .select(TextOps.md5Long(col("s")).as("h"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) == 1)
    assert(rows.filter(!_.isNullAt(0)).forall(_.getLong(0) >= 0))
  }

  test("optimizer rule rewrites the portable composition to the native expression") {
    val sessionWithRule = spark.newSession()
    sessionWithRule.experimental.extraOptimizations =
      Seq(graft.functions.RewriteMd5Prefix)
    // needs a real scan: constant folding evaluates literal inputs away
    val df = Tables.documents(sessionWithRule, "/root/testdata/sf0.001")
      .select(TextOps.md5LongPortable(col("text")).as("h"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("md5_prefix64"), optimized)
    // rewritten plan values == un-rewritten portable values (base session
    // has no extra optimizations)
    val viaRule = df.orderBy("h").collect().map(_.getLong(0)).toSeq
    val portable = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(TextOps.md5LongPortable(col("text")).as("h"))
      .orderBy("h").collect().map(_.getLong(0)).toSeq
    assert(viaRule == portable && viaRule.nonEmpty)
  }

  test("participates in codegen (no fallback to interpreted projection)") {
    // needs a real scan: a local relation constant-folds the expression
    // away. Execute first — AQE materializes codegen markers ('*(n)')
    // only in the final plan.
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(TextOps.md5Long(col("text")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' marks a whole-stage-codegen'd operator in the plan string
    assert("""\*\(\d+\) Project \[md5_prefix64""".r.findFirstIn(plan).isDefined,
      plan.take(500))
  }
}
