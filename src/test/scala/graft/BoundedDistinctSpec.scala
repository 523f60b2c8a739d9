package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BoundedDistinctSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("k smallest distinct values, invariant to partitioning, nulls skipped") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val raw = (1 to 500).map(i => (i % 7, s"v${i % 23}")) ++
      Seq((0, null.asInstanceOf[String]), (1, null.asInstanceOf[String]))
    def run(parts: Int) = raw.toDF("g", "s").repartition(parts)
      .groupBy("g").agg(expr("bounded_distinct(s, 4)").as("sample"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toList).toMap
    val truth = raw.filter(_._2 != null).groupBy(_._1)
      .map { case (g, vs) => g -> vs.map(_._2).distinct.sorted.take(4) }
    val narrow = run(1)
    val wide = run(13)
    assert(narrow == truth)
    assert(wide == truth, "merge path must preserve the k smallest")
  }

  test("k above the distinct count returns the full sorted set") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val out = Seq(("a", "z"), ("a", "x"), ("a", "z"))
      .toDF("g", "s").groupBy("g")
      .agg(expr("bounded_distinct(s, 100)").as("sample"))
      .collect()(0).getSeq[String](1).toList
    assert(out == List("x", "z"))
  }
}
