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

  test("values over 65535 UTF-8 bytes survive the partial-agg shuffle") {
    // writeUTF-based serialization threw UTFDataFormatException here
    // (ADVICE r2) — the repartition forces serialize/deserialize between
    // partial and final aggregation.
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val big = "x" * 70000
    val out = Seq(("g", big), ("g", "a" * 70000), ("g", big))
      .toDF("g", "s").repartition(5)
      .groupBy("g").agg(expr("bounded_distinct(s, 2)").as("sample"))
      .collect()(0).getSeq[String](1).toList
    assert(out == List("a" * 70000, big))
  }

  test("collation is binary UTF-8, matching the engine's own string ordering") {
    // U+E000 (3-byte UTF-8, high UTF-16 code unit) vs U+1F600 (4-byte
    // UTF-8, surrogate pair): UTF-16 code-unit order puts the emoji FIRST,
    // binary UTF-8 puts it LAST. The aggregate must agree with Spark's
    // min() — i.e. binary — or the k-smallest contract silently diverges
    // from both engines on non-BMP data.
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val privateUse = ""
    val emoji = new String(Character.toChars(0x1F600))
    assert(privateUse.compareTo(emoji) > 0, "sanity: UTF-16 disagrees")
    val row = Seq(("g", privateUse), ("g", emoji))
      .toDF("g", "s").repartition(3)
      .groupBy("g")
      .agg(expr("bounded_distinct(s, 1)").as("sample"), min("s").as("engine_min"))
      .collect()(0)
    assert(row.getSeq[String](1).toList == List(row.getString(2)),
      "bounded_distinct's smallest must equal the engine's min()")
    assert(row.getString(2) == privateUse)
  }
}
