package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Embeddings
import graft.text.TextOps

/** KMV distinct sketch, Zipf fit, OOV rate, NFC normalization, and
  * centroid drift — each pinned against a plain-Scala twin of the same
  * deterministic math.
  */
class CorpusDiagnosticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Plain-JVM twin of TextOps.md5Long (first 60 bits of md5 as long). */
  private def md5Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  // ---- KMV ----

  test("kmvDistinct matches the brute-force (k-1)/u_k estimate") {
    val items = (1 to 1000).map(i => (s"w${i % 317}", "g")).toDF("it", "g")
    val k = 16
    val row = TextOps.kmvDistinct(items, col("it"), col("g"), k)
      .collect().head
    val hashes = (0 until 317).map(i => md5Long(s"kmv:w$i")).distinct.sorted
    val hk = hashes(k - 1)
    val expected = BigDecimal((k - 1).toDouble * math.pow(2, 60) / hk.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Long]("n_kept") == k)
    assert(row.getAs[Long]("exact_distinct") == 317L)
    assert(row.getAs[Double]("kmv_estimate") == expected)
  }

  test("kmvDistinct: fewer distincts than k reports the exact count") {
    val items = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq("c")
    val df = items.map((_, "g")).toDF("it", "g")
    val row = TextOps.kmvDistinct(df, col("it"), col("g"), k = 64)
      .collect().head
    assert(row.getAs[Long]("n_kept") == 3L)
    assert(row.getAs[Double]("kmv_estimate") == 3.0)
    assert(row.getAs[Double]("rel_err") == 0.0)
  }

  test("kmvDistinct estimate is within 30% of exact at k=64 on 2k items") {
    val items = (1 to 6000).map(i => (s"t${i % 2000}", "g")).toDF("it", "g")
    val row = TextOps.kmvDistinct(items, col("it"), col("g"), k = 64)
      .collect().head
    assert(row.getAs[Double]("rel_err") < 0.3,
      s"rel_err ${row.getAs[Double]("rel_err")}")
  }

  test("kmvDistinct is partitioning-invariant") {
    val items = (1 to 500).map(i => (s"x${i % 99}", s"g${i % 3}"))
      .toDF("it", "g")
    val a = TextOps.kmvDistinct(items, col("it"), col("g"), 8)
      .orderBy("grp").collect().toSeq
    val b = TextOps.kmvDistinct(items.repartition(17), col("it"), col("g"), 8)
      .orderBy("grp").collect().toSeq
    assert(a == b)
  }

  // ---- Zipf ----

  test("zipfSlope recovers the slope of an exact power law") {
    // construct a corpus whose rank-frequency IS freq = 1000 / rank
    // (slope −1 in log-log): term w_r appears round(1000/r) times
    val words = (1 to 50).flatMap(r =>
      Seq.fill(math.round(1000.0 / r).toInt)(s"w${"%03d".format(r)}"))
    val docs = Seq((1L, words.mkString(" "), "en", "s1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val slope = TextOps.zipfSlope(docs, topN = 50)
      .collect().head.getAs[Double]("zipf_slope")
    // rounding of counts to integers perturbs the fit slightly
    assert(math.abs(slope - (-1.0)) < 0.01, s"slope $slope")
  }

  test("zipfSlope: uniform frequencies give slope 0") {
    val words = (1 to 40).flatMap(r => Seq.fill(5)(s"u$r"))
    val docs = Seq((1L, words.mkString(" "), "en", "s1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val slope = TextOps.zipfSlope(docs, topN = 40)
      .collect().head.getAs[Double]("zipf_slope")
    assert(slope == 0.0)
  }

  // ---- OOV ----

  test("oovRate: tokens outside the top-K vocabulary are counted") {
    // vocab size 2 → "a" and "b" (most frequent); "z1".."z4" are OOV
    val docs = Seq(
      (1L, "a a a b b z1", "en", "s1", 1L),
      (2L, "a b z2 z3 z4", "en", "s2", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextOps.oovRate(docs, vocabSize = 2)
      .orderBy("source").collect()
    assert(got(0).getAs[Long]("n_oov") == 1L) // s1: z1
    assert(got(0).getAs[Double]("oov_rate") == BigDecimal(1.0 / 6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(1).getAs[Long]("n_oov") == 3L) // s2: z2 z3 z4
    assert(got(1).getAs[Double]("oov_rate") == 0.6)
  }

  test("oovRate vocabulary cut is deterministic under frequency ties") {
    // all terms tie at freq 1 → vocab = lexicographically first K
    val docs = Seq((1L, "d c b a", "en", "s1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextOps.oovRate(docs, vocabSize = 2).collect().head
    assert(got.getAs[Long]("n_oov") == 2L) // c, d are OOV; a, b in vocab
  }

  // ---- NFC normalization ----

  test("nfc_normalize composes decomposed sequences and is identity on NFC") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq("café", "café", "plain ascii")
      .toDF("s")
      .select(call_function("nfc_normalize", col("s")).as("n"),
        length(col("s")).as("raw_len"),
        length(call_function("nfc_normalize", col("s"))).as("norm_len"))
    val rows = df.collect()
    assert(rows(0).getAs[String]("n") == "caf\u00e9")
    assert(rows(0).getAs[Int]("raw_len") == 5)
    assert(rows(0).getAs[Int]("norm_len") == 4)
    assert(rows(1).getAs[String]("n") == "caf\u00e9")
    assert(rows(2).getAs[String]("n") == "plain ascii")
  }

  test("nfc_normalize stays inside whole-stage codegen") {
    graft.functions.GraftFunctions.register(spark)
    // a Range source (not a LocalTableScan, which constant-folds the
    // whole projection away) so the projection actually plans
    val df = spark.range(3)
      .select(call_function("nfc_normalize",
        concat(lit("e\u0301x"), col("id").cast("string"))).as("n"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen
    // stage (same assertion style as VecDotSpec)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*("), plan)
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("\u00e9x0", "\u00e9x1", "\u00e9x2"))
  }

  // ---- centroid drift ----

  test("centroidDrift: identical halves give cosine 1") {
    // vectors chosen so even and odd halves have the SAME centroid
    val rows = Seq(
      (0L, Array(1f, 0f), 1), (2L, Array(0f, 1f), 1), // even half
      (1L, Array(1f, 0f), 1), (3L, Array(0f, 1f), 1)) // odd half
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Embeddings.centroidDrift(df).collect().head
    assert(got.getAs[Long]("n_even") == 2L)
    assert(got.getAs[Long]("n_odd") == 2L)
    assert(got.getAs[Double]("drift_cosine") == 1.0)
  }

  // ---- KMV pair Jaccard ----

  test("kmvPairJaccard is exact when k covers the union") {
    // |A ∪ B| = 30 < k=64 → the merged sketch IS the union, estimate
    // must equal the exact Jaccard: |A∩B|=10, |A∪B|=30 → 1/3
    val items = ((1 to 20).map(i => (s"w$i", "a")) ++
      (11 to 30).map(i => (s"w$i", "b"))).toDF("it", "g")
    val row = TextOps.kmvPairJaccard(items, col("it"), col("g"), k = 64)
      .collect().head
    val third = BigDecimal(10.0 / 30)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("kmv_jaccard") == third)
    assert(row.getAs[Double]("exact_jaccard") == third)
    assert(row.getAs[Double]("abs_err") == 0.0)
  }

  test("kmvPairJaccard: identical groups give 1, disjoint give 0") {
    val items = ((1 to 40).map(i => (s"s$i", "a")) ++
      (1 to 40).map(i => (s"s$i", "b")) ++
      (100 to 140).map(i => (s"s$i", "c"))).toDF("it", "g")
    val got = TextOps.kmvPairJaccard(items, col("it"), col("g"), k = 32)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("kmv_jaccard")).toMap
    assert(got(("a", "b")) == 1.0)
    assert(got(("a", "c")) == 0.0)
    assert(got(("b", "c")) == 0.0)
  }

  // ---- scene cuts ----

  /** TRUE-luma fixture (r7): gray pixels (b,b,b) decode to luma exactly
    * b because 2126+7152+722 = 10000 — so a payload of repeated chars
    * in 3-byte groups gives hand-predictable frame energies. Widths are
    * chosen so pixels fill whole rows (no black padding pixels). */
  private def grayBmp(id: Long, payload: String) =
    (id, "bmp", graft.functions.MediaCodec.bmpEncode(
      payload.getBytes("UTF-8"), 8))

  test("sceneCuts flags the frame where energy jumps") {
    import spark.implicits._
    // 96 gray pixels = 3 luma frames of 32: 'a'(97)×64px, 'z'(122)×32px
    // — deltas (0, 25·32=800); mean 400, threshold 1.5×mean=600 →
    // exactly one cut at frame 2. Real BMP container, real parse.
    val media = Seq(grayBmp(1L, "a" * 192 + "z" * 96))
      .toDF("doc_id", "format", "content")
    val row = graft.mm.Multimodal.sceneCuts(media).collect().head
    assert(row.getAs[Int]("n_frames") == 3)
    assert(row.getAs[Long]("n_deltas") == 2L)
    assert(row.getAs[Long]("n_cuts") == 1L)
    assert(row.getAs[Int]("first_cut") == 2)
  }

  test("sceneCuts: constant frames yield no cuts; 1-frame videos drop") {
    import spark.implicits._
    val flat = Seq(
      grayBmp(1L, "q" * 384), // 128 pixels → 4 frames, all luma 113
      grayBmp(2L, "q" * 96))  // 32 pixels → 1 frame → no deltas, drops
      .toDF("doc_id", "format", "content")
    val got = graft.mm.Multimodal.sceneCuts(flat).collect()
    assert(got.length == 1 && got.head.getAs[Long]("doc_id") == 1L)
    assert(got.head.getAs[Long]("n_cuts") == 0L)
    assert(got.head.isNullAt(got.head.fieldIndex("first_cut")))
  }

  // ---- water-filling ----

  test("waterFill: uniform cap, full prefix, budget never exceeded") {
    // sources 10/20/100/200 tokens, total 330, budget 165:
    // 10 and 20 fit fully (30), cap = (165-30) div 2 = 67 for the rest
    def doc(id: Long, src: String, n: Int) =
      (id, Seq.fill(n)("tok").mkString(" "), "en", src, n.toLong)
    val docs = Seq(doc(1, "sA", 10), doc(2, "sB", 20),
      doc(3, "sC", 100), doc(4, "sD", 200))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextOps.waterFill(docs).orderBy("source").collect()
    val alloc = got.map(r => r.getString(0) -> r.getAs[Long]("allocation")).toMap
    assert(alloc == Map("sA" -> 10L, "sB" -> 20L, "sC" -> 67L, "sD" -> 67L))
    assert(got.map(_.getAs[Long]("allocation")).sum <= 165L)
    assert(got.count(_.getAs[Boolean]("is_full")) == 2)
  }

  test("waterFill: budget covering everything takes everything") {
    // equal sources: budget = total/2 caps each at half
    def doc(id: Long, src: String, n: Int) =
      (id, Seq.fill(n)("t").mkString(" "), "en", src, n.toLong)
    val docs = Seq(doc(1, "a", 40), doc(2, "b", 40))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextOps.waterFill(docs).collect()
    assert(got.forall(_.getAs[Long]("allocation") == 20L))
  }

  // ---- n-gram novelty ----

  test("ngramNovelty separates a duplicated doc from a unique one") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "en", "s1", 1L),
      (2L, "alpha beta gamma delta", "en", "s2", 1L), // exact dup of 1
      (3L, "wholly original text here", "en", "s3", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextOps.ngramNovelty(docs, k = 3)
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Double]("novelty") == 0.0) // all shingles shared
    assert(got(1).getAs[Double]("novelty") == 0.0)
    assert(got(2).getAs[Double]("novelty") == 1.0) // none shared
    assert(got(0).getAs[Long]("n_shingles") == 2L) // 4 tokens, k=3
  }

  // ---- corpus manifest ----

  test("corpus manifest XOR is partitioning- and order-invariant") {
    import org.apache.spark.sql.DataFrame
    graft.functions.GraftFunctions.register(spark)
    def manifest(df: DataFrame) = df
      .select(col("source"), TextOps.md5Long(col("text")).as("h"))
      .groupBy("source").agg(expr("bit_xor(h)").as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = (1 to 200).map(i => (s"s${i % 4}", s"text body $i"))
      .toDF("source", "text")
    val a = manifest(docs)
    val b = manifest(docs.repartition(17).sortWithinPartitions("text"))
    assert(a == b)
    // a single changed document changes its source's fingerprint
    val mutated = manifest(docs.withColumn("text",
      when(col("text") === "text body 7", lit("CHANGED")).otherwise(col("text"))))
    assert(mutated("s3") != a("s3") && mutated("s0") == a("s0"))
  }

  // ---- training triplets ----

  test("trainingTriplets picks nearest same-label and nearest cross-label") {
    // anchor 0 (label 1): positive must be vec 1 (identical, same label),
    // negative must be vec 2 (identical direction, other label) over vec 3
    val rows = Seq(
      (0L, Array(1f, 0f), 1), (1L, Array(1f, 0f), 1),
      (5L, Array(0f, 1f), 1),
      (2L, Array(1f, 0f), 2), (3L, Array(0f, 1f), 2))
      .toDF("vec_id", "embedding", "label")
    val t = Embeddings.trainingTriplets(rows, col("vec_id") === 0)
      .collect().head
    assert(t.getAs[Long]("positive_id") == 1L)
    assert(t.getAs[Double]("pos_cos") == 1.0)
    assert(t.getAs[Long]("negative_id") == 2L)
    assert(t.getAs[Double]("neg_cos") == 1.0)
    assert(t.getAs[Double]("margin") == 0.0)
  }

  // ---- leakage-aware split ----

  test("td_split_leakage: cluster-aware split leaks zero near-dup pairs") {
    val rows = graft.queries.TrainingOps
      .queries("td_split_leakage")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    // zero leakage by construction: every cluster member shares its
    // root's hash, so no near-dup pair can straddle a boundary
    assert(rows.forall(_.getAs[Long]("leaked_aware") == 0L))
    // both assignments cover every document exactly once
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val totalNaive = rows.map(_.getAs[Long]("n_docs_naive")).sum
    assert(total == totalNaive)
  }

  // ---- Kaplan–Meier ----

  test("q67_survival: survival is in (0,1], non-increasing, starts at full risk") {
    val rows = graft.queries.Relational
      .queries("q67_survival")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    val surv = rows.map(_.getAs[Double]("survival"))
    assert(surv.forall(v => v > 0.0 && v <= 1.0))
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a },
      "survival must be non-increasing")
    // day-0 risk set = every user with a signup (events or censored)
    val firstRisk = rows.head.getAs[Long]("n_risk")
    assert(firstRisk >= surv.length, s"risk $firstRisk")
  }

  test("centroidDrift: orthogonal halves give cosine 0") {
    val rows = Seq(
      (0L, Array(1f, 0f), 7), (1L, Array(0f, 1f), 7))
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Embeddings.centroidDrift(df).collect().head
    assert(got.getAs[Double]("drift_cosine") == 0.0)
  }
}
