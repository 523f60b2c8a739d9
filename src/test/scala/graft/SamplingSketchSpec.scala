package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** Efraimidis–Spirakis weighted sampling + count–min sketch, pinned
  * against plain-Scala reimplementations of the same deterministic math.
  */
class SamplingSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Plain-JVM twin of TextOps.md5Long (first 60 bits of md5 as long). */
  private def md5Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def esKey(id: Long, w: Double): Double = {
    val u = (md5Long(s"ws:$id") % 1000000000L + 0.5) / 1.0e9
    math.log(u) / w
  }

  test("weightedSample matches the brute-force top-k of the same keys") {
    val df = (1L to 200L).map(i => (i, (i % 7 + 1) * 10L)).toDF("id", "w")
    val got = TextOps.weightedSample(df, col("id"), col("w"), k = 25)
      .select("sample_rank", "id").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expect = (1L to 200L)
      .map(i => i -> esKey(i, ((i % 7 + 1) * 10L).toDouble))
      .sortBy { case (id, k) => (-k, id) }.take(25).map(_._1)
    expect.zipWithIndex.foreach { case (id, i) => assert(got(i + 1) == id) }
  }

  test("weightedSample is deterministic across runs and partitionings") {
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "w")
    val a = TextOps.weightedSample(df, col("id"), col("w"), k = 10)
      .select("id").collect().map(_.getLong(0)).toSeq
    val b = TextOps.weightedSample(df.repartition(13), col("id"), col("w"), k = 10)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("a dominant weight is sampled first") {
    val df = ((1L to 50L).map(i => (i, 1L)) :+ (99L, 1000000000L))
      .toDF("id", "w")
    val first = TextOps.weightedSample(df, col("id"), col("w"), k = 5)
      .filter(col("sample_rank") === 1).select("id").first().getLong(0)
    assert(first == 99L)
  }

  test("cms estimate is >= exact count and exact when collision-free") {
    val items = Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++
      Seq.fill(10)("gamma") ++ Seq("delta")
    val df = items.toDF("term")
    val sketch = TextOps.cmsSketch(df, col("term"), depth = 3, width = 128)
    // sketch never exceeds depth×width cells and counts every insertion
    assert(sketch.count() <= 3L * 128)
    assert(sketch.groupBy("srow").agg(sum("cell_count").as("s"))
      .collect().forall(_.getLong(1) == items.size.toLong))
    val probes = df.groupBy("term").agg(count(lit(1)).as("exact"))
    val est = TextOps.cmsEstimate(probes, col("term"), sketch, 3, 128)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.length == 4)
    est.foreach { case (_, exact, e) => assert(e >= exact) }
    // 4 distinct terms in a 128-wide row: no collisions expected in ALL
    // three rows simultaneously unless two terms share every bucket —
    // verify min-over-rows recovers the exact counts here
    est.foreach { case (_, exact, e) => assert(e == exact) }
  }

  test("cms min-over-rows beats any single row under forced collisions") {
    // width 2 forces heavy collisions; the estimate is still an upper
    // bound and equals the min across the depth rows
    val items = (1 to 60).map(i => s"t${i % 6}")
    val df = items.toDF("term")
    val sketch = TextOps.cmsSketch(df, col("term"), depth = 4, width = 2)
    val probes = df.groupBy("term").agg(count(lit(1)).as("exact"))
    val est = TextOps.cmsEstimate(probes, col("term"), sketch, 4, 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    est.foreach { case (exact, e) => assert(e >= exact && e <= 60) }
  }
}
