package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Embeddings

/** The r9 SemDeDup shuffle-volume work (VERDICT r8 "Next round" #1):
  * the int8 pair pre-verify and the cell-bucketed-postings variant must
  * both be ROW-IDENTICAL to the historical exact-pair path — the
  * quantized prefilter is a byte-width optimization with an analytic
  * recall-1 slack, never a semantics change. Boundary pairs are crafted
  * to land INSIDE the ambiguous band (where only the exact confirm can
  * decide) and right at the 6dp rounding half-step.
  */
class SemDedupScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def resultSet(df: org.apache.spark.sql.DataFrame) =
    df.select("cell", "vec_id", "centroid_cos", "is_dup").collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getLong(1),
        Option(r.get(2)).map(_.toString).getOrElse("null"),
        r.getAs[Number](3).intValue())).toSet

  // ---- the packed-int8 expression pair ----

  test("i8_pack packs signed bytes and clamps out-of-range ints") {
    val rows = Seq((Seq(0, 1, -1, 127, -127, 300, -300), 0))
      .toDF("q", "x")
      .select(Embeddings.i8Pack(col("q")).as("b")).collect()
    assert(rows(0).getAs[Array[Byte]](0).toSeq ===
      Seq[Byte](0, 1, -1, 127, -127, 127, -128))
  }

  test("vec_dot_i8 is the exact integer dot; null and truncation match vec_dot") {
    val df = Seq(
      (Some(Seq(1, 2, 3)), Some(Seq(4, 5))),          // truncates to 1*4+2*5
      (None: Option[Seq[Int]], Some(Seq(1)))           // null -> null
    ).toDF("a", "b")
      .select(Embeddings.dotI8(
        Embeddings.i8Pack(col("a")), Embeddings.i8Pack(col("b"))).as("d"))
    val rows = df.collect()
    assert(rows(0).getLong(0) === 14L)
    assert(rows(1).isNullAt(0))
    // exhaustive sign corners: (-128)*(-128) etc. stay exact in long
    val corner = Seq((Seq(-128, -128, 127), Seq(-128, 127, 127)))
      .toDF("a", "b")
      .select(Embeddings.dotI8(
        Embeddings.i8Pack(col("a")), Embeddings.i8Pack(col("b"))).as("d"))
      .first().getLong(0)
    assert(corner === (-128L * -128) + (-128L * 127) + (127L * 127))
  }

  test("vec_dot_i8 matches a driver-side dot on the real corpus's quantized vectors") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"),
        Embeddings.quantizeInt8(Embeddings.asDouble(col("embedding"))).as("qz"))
      .select(col("vec_id"), col("qz.q").as("q"),
        Embeddings.i8Pack(col("qz.q")).as("qb"))
    val pairs = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(300)
      .select(col("a.q").as("qa"), col("b.q").as("qcb"),
        Embeddings.dotI8(col("a.qb"), col("b.qb")).as("native"))
      .collect()
    pairs.foreach { r =>
      val qa = r.getSeq[Int](0); val qb = r.getSeq[Int](1)
      val expect = qa.zip(qb).map { case (x, y) => x.toLong * y.toLong }.sum
      assert(r.getLong(2) === expect)
    }
  }

  test("i8_pack_l / vec_dot_i8_l: long-word packing matches the binary pair exactly") {
    // same clamp, same dot, different container — the long-word pair is
    // the per-pair hot-loop format (view access, no copy); equality with
    // the binary pair on real quantized vectors pins the packing
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"),
        Embeddings.quantizeInt8(Embeddings.asDouble(col("embedding"))).as("qz"))
      .select(col("vec_id"),
        Embeddings.i8Pack(col("qz.q")).as("qb"),
        Embeddings.i8PackL(col("qz.q")).as("ql"))
    val pairs = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(300)
      .select(Embeddings.dotI8(col("a.qb"), col("b.qb")).as("bin"),
        Embeddings.dotI8L(col("a.ql"), col("b.ql")).as("lng"))
      .filter(col("bin") =!= col("lng")).count()
    assert(pairs === 0)
    // clamp + sign corners + non-multiple-of-8 length and zero padding
    val corner = Seq((Seq(-128, -128, 127, 300, -300, 1, -1, 2, 3),
                      Seq(-128, 127, 127, -300, 300, -1, 1, 2, 3)))
      .toDF("a", "b")
      .select(Embeddings.dotI8L(
        Embeddings.i8PackL(col("a")), Embeddings.i8PackL(col("b"))).as("d"))
      .first().getLong(0)
    val expect = Seq((-128, -128), (-128, 127), (127, 127), (127, -128),
      (-128, 127), (1, -1), (-1, 1), (2, 2), (3, 3))
      .map { case (x, y) => x.toLong * y }.sum
    assert(corner === expect)
  }

  test("vec_dot_i8 stays inside whole-stage codegen") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(Embeddings.i8Pack(
        Embeddings.quantizeInt8(Embeddings.asDouble(col("embedding")))
          .getField("q")).as("qb"))
    val df = e.select(Embeddings.dotI8(col("qb"), col("qb")).as("d"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("vec_dot_i8") && l.contains("*(")), plan)
  }

  // ---- quantized pre-verify ≡ exact path ----

  test("quantPre ≡ exact on the real corpus, derived cells, both thresholds") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    for (t <- Seq(0.4, 0.9); cells <- Seq(4, 16)) {
      val exact = resultSet(Embeddings.semDedup(e, threshold = t, nCells = cells))
      val quant = resultSet(Embeddings.semDedup(e, threshold = t, nCells = cells,
        quantPre = true))
      assert(quant === exact, s"threshold=$t cells=$cells")
    }
  }

  test("quantPre ≡ exact on label cells (pre-clustered input)") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("label", pmod(col("vec_id"), lit(3L)))
    val exact = resultSet(Embeddings.semDedup(e, threshold = 0.5))
    val quant = resultSet(Embeddings.semDedup(e, threshold = 0.5, quantPre = true))
    assert(quant === exact)
  }

  /** Pairs crafted to land in the ambiguous band: cosines within ±1e-6
    * of the 0.4 threshold (the 6dp rounding half-step sits at
    * 0.3999995), far inside the int8 slack (~0.02 at d=4), so the
    * prefilter CANNOT decide them — only the float confirm can. A
    * quantization or rounding defect flips is_dup here. */
  test("boundary cosines at the 6dp rounding half-step decide identically") {
    def v(x: Double): Array[Float] =
      Array(x.toFloat, math.sqrt(1.0 - x * x).toFloat, 0.0f, 0.0f)
    // vec 0 is the reference axis; the rest straddle cos≈0.4 from both
    // sides of the rounding boundary (exact float32 values will move a
    // hair — parity, not absolute classification, is the contract)
    val rows = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, v(0.3999990), 0),
      (2L, v(0.3999996), 0),
      (3L, v(0.4000004), 0),
      (4L, v(0.4000010), 0),
      (5L, v(0.9999990), 0)
    ).toDF("vec_id", "embedding", "label")
    val exact = resultSet(Embeddings.semDedup(rows, threshold = 0.4))
    val quant = resultSet(Embeddings.semDedup(rows, threshold = 0.4, quantPre = true))
    assert(quant === exact)
    // and the crafted frame is non-trivial: at least one dup, one keep
    assert(exact.exists(_._4 == 1) && exact.exists(_._4 == 0))
  }

  test("zero-norm vectors raise DIVIDE_BY_ZERO identically in both paths (ANSI)") {
    // under Spark 4's ANSI default the SHARED scored prelude throws on
    // the zero-norm cosine before either branch's pair arithmetic runs —
    // the two paths fail the same way instead of silently diverging
    val rows = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    def classify(quantPre: Boolean): String =
      try { Embeddings.semDedup(rows, threshold = 0.4, quantPre = quantPre)
              .collect(); "ok" }
      catch { case e: Throwable =>
        if (e.toString.contains("DIVIDE_BY_ZERO") ||
            Option(e.getCause).exists(_.toString.contains("DIVIDE_BY_ZERO")))
          "divide_by_zero" else throw e }
    assert(classify(quantPre = false) === "divide_by_zero")
    assert(classify(quantPre = true) === "divide_by_zero")
  }

  // ---- bucketed postings variant ----

  test("semDedupBucketed ≡ semDedup row-for-row on the real corpus, scratch dropped") {
    val dir = java.nio.file.Files.createTempDirectory("semdedup_bkt").toString
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = resultSet(Embeddings.semDedup(e, threshold = 0.4, nCells = 4))
    val bkt = resultSet(Embeddings.semDedupBucketed(spark, e, s"$dir/t",
      threshold = 0.4, nCells = 4, table = "semdedup_spec_scored"))
    assert(bkt === exact)
    // hygiene (VERDICT r9 #4): no scratch outlives the call — the
    // suffixed catalog table is dropped and the postings dir deleted
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("semdedup_spec_scored")))
    val base = new java.io.File(s"$dir/t")
    assert(!base.exists() || base.listFiles().isEmpty,
      base.listFiles().map(_.getName).mkString(", "))
  }

  test("concurrent bucketed evaluations are isolated (same JVM and separate sessions)") {
    // VERDICT r9 #4's done-condition: two concurrent emb_semdedup-shaped
    // evaluations in one JVM and across two sessions produce correct
    // independent results — the r9 code's fixed shared path + fixed
    // catalog name ('semdedup_scored', mode overwrite) would have had
    // them clobber each other's scored postings mid-query
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = java.nio.file.Files.createTempDirectory("semdedup_conc").toString
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val expected = resultSet(Embeddings.semDedup(e, threshold = 0.4, nCells = 4))
    val s2 = spark.newSession()
    // function registration is session-scoped — the fresh session needs
    // its own copy of the graft expression registry
    graft.functions.GraftFunctions.register(s2)
    val e2 = Tables.embeddings(s2, "/root/testdata/sf0.001")
    val runs = Seq(
      Future(resultSet(Embeddings.semDedupBucketed(spark, e, s"$dir/t",
        threshold = 0.4, nCells = 4))),
      Future(resultSet(Embeddings.semDedupBucketed(spark, e, s"$dir/t",
        threshold = 0.4, nCells = 4))),
      Future(resultSet(Embeddings.semDedupBucketed(s2, e2, s"$dir/t",
        threshold = 0.4, nCells = 4))))
    Await.result(Future.sequence(runs), 5.minutes)
      .zipWithIndex.foreach { case (r, i) => assert(r === expected, s"run $i") }
  }

  test("bucketed scored table ranks and self-joins with zero exchanges") {
    val dir = java.nio.file.Files.createTempDirectory("semdedup_bkt_plan").toString
    val scored = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(pmod(col("vec_id"), lit(4L)).as("cell"), col("vec_id"),
        Embeddings.asDouble(col("embedding")).as("emb"))
      .withColumn("vnorm", Embeddings.norm(col("emb")))
      .withColumn("ccos", round(col("vnorm") / (col("vnorm") + 1.0), 6))
    graft.ops.Bucketing.writeBucketed(scored, "semdedup_plan_scored",
      s"$dir/t", "cell", 8)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val ranked = spark.table("semdedup_plan_scored")
        .withColumn("crank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("cell")
            .orderBy(col("ccos").asc, col("vec_id").asc)))
      val a = ranked.select(col("cell"), col("crank").as("rank_a"),
        col("vec_id").as("vid_a"))
      val pairs = a.join(ranked, Seq("cell")).filter(col("rank_a") < col("crank"))
      assert(pairs.count() > 0)
      val plan = pairs.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        plan.linesIterator.take(20).mkString("\n"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS semdedup_plan_scored")
    }
  }

  test("exact-copy collapse ≡ direct pair pass on a multiplicity-heavy corpus (r10)") {
    // The fifth-decade finding: byte-identical embeddings (multiplicity
    // m) blow the Σ|cell|² bound up by m² unless the pair pass runs on
    // one representative per distinct (cell, emb) value. The collapse is
    // an EXACT rewrite — pinned here on a corpus with interleaved copy
    // ids, a true near-dup pair, exact-copy groups, and singletons, at a
    // mid threshold and at the t=1.0 edge (where ONLY exact copies dup).
    def v(xs: Double*): Array[Float] = {
      val a = xs.map(_.toFloat).toArray
      val n = math.sqrt(a.map(x => x.toDouble * x).sum).toFloat
      a.map(_ / n)
    }
    val A = v(1, 0, 0, 0); val B = v(1, 0.25, 0, 0) // cos(A,B) ≈ 0.970
    val C = v(0, 0, 1, 0)
    val D = v(0, 1, 0, 0); val E = v(0, 1, 0.3, 0)  // cos(D,E) ≈ 0.958
    val F = v(0, 0, 0, 1)
    val rows = Seq(
      (0L, A, 0), (7L, A, 0), (9L, A, 0),  // multiplicity 3
      (1L, B, 0), (8L, B, 0),              // multiplicity 2, near-dup of A
      (2L, C, 0),                          // singleton
      (3L, D, 1), (4L, D, 1),              // multiplicity 2
      (5L, E, 1), (6L, F, 1)               // near-dup of D; singleton
    ).toDF("vec_id", "embedding", "label")
    for (t <- Seq(0.9, 1.0)) {
      val direct = resultSet(Embeddings.semDedup(rows, threshold = t))
      assert(resultSet(Embeddings.semDedup(rows, threshold = t,
        collapseExact = true)) === direct, s"classic+collapse t=$t")
      assert(resultSet(Embeddings.semDedup(rows, threshold = t,
        quantPre = true, collapseExact = true)) === direct,
        s"quantPre+collapse t=$t")
      val dir = java.nio.file.Files.createTempDirectory("semdedup_cx").toString
      assert(resultSet(Embeddings.semDedupBucketed(spark, rows, s"$dir/t",
        threshold = t)) === direct, s"bucketed(collapsed) t=$t")
      // sanity on the fixture itself. At t=1.0 only exact copies dup
      // (survivor = min id per value). At t=0.9 the near-dup GROUPS
      // merge and the survivor is the least centroid-typical member:
      // B's copies sit farther from cell 0's centroid (pulled toward
      // A's 3 copies) so B(1) survives and ALL of A's copies drop;
      // likewise E(5) survives over D's copies in cell 1.
      val dups = direct.filter(_._4 == 1).map(_._2)
      if (t == 1.0) assert(dups.toSet === Set(7L, 8L, 9L, 4L))
      else assert(dups.toSet === Set(0L, 7L, 9L, 8L, 3L, 4L))
    }
  }

  test("the registered knob engages past the coarse floor only") {
    import graft.ops.ScaleKnobs
    assert(!ScaleKnobs.semDedupPostings(16))
    assert(!ScaleKnobs.semDedupPostings(256))
    assert(ScaleKnobs.semDedupPostings(257))
    assert(ScaleKnobs.semDedupPostings(16000))
  }
}
