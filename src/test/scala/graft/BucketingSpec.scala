package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Bucketing

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed tables join with zero shuffle exchanges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bucketed").toString
    val left = (1 to 2000).map(i => (i.toLong % 100, s"l$i")).toDF("k", "lv")
    val right = (1 to 500).map(i => (i.toLong % 100, s"r$i")).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bkt_left", s"$dir/left", "k", 8)
    Bucketing.writeBucketed(right, "bkt_right", s"$dir/right", "k", 8)
    try {
      // disable broadcast so the plan must rely on bucket co-location
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      val expected = left.join(right, "k").count()
      assert(joined.count() == expected)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.linesIterator.take(12).mkString("\n"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("aggregation on the bucket key also skips the shuffle") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bucketed_agg").toString
    val df = (1 to 1000).map(i => (i.toLong % 50, i.toDouble)).toDF("k", "v")
    Bucketing.writeBucketed(df, "bkt_agg", s"$dir/t", "k", 8)
    try {
      val agg = spark.table("bkt_agg").groupBy("k").agg(sum("v").as("s"))
      assert(agg.count() == 50)
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        plan.linesIterator.take(12).mkString("\n"))
    } finally spark.sql("DROP TABLE IF EXISTS bkt_agg")
  }
}
