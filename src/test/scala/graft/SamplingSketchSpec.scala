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

  test("weightedSamplePerGroup: independent k-draw per stratum, same keys") {
    val df = (1L to 120L).map(i => (i, (i % 5 + 1) * 7L, s"g${i % 3}"))
      .toDF("id", "w", "g")
    val got = TextOps.weightedSamplePerGroup(
      df, col("id"), col("w"), col("g"), k = 4)
      .collect().map(r => (r.getString(2), r.getInt(3), r.getLong(0))).toSet
    // brute: per group, top-4 by the same ES key
    val expect = (1L to 120L).groupBy(i => s"g${i % 3}").flatMap { case (g, ids) =>
      ids.map(i => (i, esKey(i, ((i % 5 + 1) * 7L).toDouble)))
        .sortBy { case (id, k) => (-k, id) }.take(4).zipWithIndex
        .map { case ((id, _), j) => (g, j + 1, id) }
    }.toSet
    assert(got == expect)
    // every stratum yields exactly k
    assert(got.groupBy(_._1).forall(_._2.size == 4))
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

  test("cms sketches MERGE: sketch(A ++ B) = cell-wise sum of the parts") {
    val a = Seq("x", "x", "y", "z").toDF("term")
    val b = Seq("y", "w", "w", "w").toDF("term")
    val whole = TextOps.cmsSketch(a.union(b), col("term"), 3, 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sa = TextOps.cmsSketch(a, col("term"), 3, 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sb = TextOps.cmsSketch(b, col("term"), 3, 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (sa.keySet ++ sb.keySet)
      .map(k => k -> (sa.getOrElse(k, 0L) + sb.getOrElse(k, 0L))).toMap
    assert(whole == merged)
  }

  test("linearCount: occupied == n and small rel_err when m >> n") {
    val items = (1 to 300).map(i => s"item-$i").toDF("it")
    val r = TextOps.linearCount(items, col("it"), Seq(1 << 16))
      .collect().head
    assert(r.getLong(1) == 300L) // exact_distinct
    // 300 items in 65536 buckets: expected collisions ~0.7 — allow a few
    assert(r.getLong(2) >= 297L && r.getLong(2) <= 300L)
    assert(math.abs(r.getDouble(3) - 300.0) < 5.0)
    assert(r.getDouble(4) < 0.02)
  }

  test("linearCount bitmap is duplicate-insensitive and merges by OR") {
    val once = (1 to 50).map(i => s"t$i").toDF("it")
    val thrice = ((1 to 50) ++ (1 to 50) ++ (1 to 50)).map(i => s"t$i").toDF("it")
    val o = TextOps.linearCount(once, col("it"), Seq(1024)).collect().head
    val t = TextOps.linearCount(thrice, col("it"), Seq(1024)).collect().head
    // same distinct set → identical bitmap, estimate, and exact count
    assert(o.getLong(2) == t.getLong(2) && o.getDouble(3) == t.getDouble(3))
  }

  test("histogramQuantiles: hand-computed interpolation on a uniform grid") {
    // 80 values 0..79, width 8 → 10 buckets × 8: q·n lands exactly on
    // cumulative boundaries, so the interpolated estimates are exact
    val df = (0 until 80).map(v => ("g", v)).toDF("grp0", "v")
    val r = TextOps.histogramQuantiles(
      df, col("v"), col("grp0"), Seq(0.5, 0.9, 0.99), width = 8)
      .collect().head
    assert(r.getString(0) == "g" && r.getLong(1) == 80L)
    assert(r.getDouble(2) == 40.0)  // est_p50: bucket 4 entered 8/8
    assert(r.getDouble(3) == 72.0)  // est_p90
    assert(r.getDouble(4) == 79.2)  // est_p99: 72 + 8·(79.2−72)/8
  }

  test("histogramQuantiles: estimate within one bucket width of exact, per group") {
    val df = ((1 to 500).map(i => ("a", i * 3 % 97)) ++
      (1 to 300).map(i => ("b", i * 7 % 211))).toDF("grp0", "v")
    val est = TextOps.histogramQuantiles(
      df, col("v"), col("grp0"), Seq(0.5, 0.9, 0.99), width = 8)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val exact = df.groupBy("grp0").agg(
      expr("percentile(v, 0.5)"), expr("percentile(v, 0.9)"),
      expr("percentile(v, 0.99)"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    for (g <- Seq("a", "b")) {
      assert(math.abs(est(g)._1 - exact(g)._1) <= 8.0, s"$g p50")
      assert(math.abs(est(g)._2 - exact(g)._2) <= 8.0, s"$g p90")
      assert(math.abs(est(g)._3 - exact(g)._3) <= 8.0, s"$g p99")
    }
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
