package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IncrementalAgg
import graft.plans.MvRewrite

/** The materialized-aggregate rewrite must be TRANSPARENT (same answers,
  * different scan) and CONSERVATIVE (anything it cannot prove, it leaves
  * alone). Sessions are isolated: the rule is registered on a newSession
  * so the global query surface never sees it. */
class MvRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val baseDir = "/root/testdata/sf0.001/documents.parquet"

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.mkString(",")
        case _ => ""
      }
    }

  test("matching aggregates reroute to the summary; answers identical; guards hold") {
    val session = spark.newSession()
    MvRewrite.ensureRegistered(session)
    MvRewrite.clear()
    try {
      val base = session.read.parquet(baseDir)
      val mvDir = Files.createTempDirectory("mv_docs").toString
      base.groupBy("source", "lang")
        .agg(sum("n_chars").as("sum_chars"), count(lit(1)).as("n_rows"))
        .write.mode("overwrite").parquet(mvDir)
      MvRewrite.register(session.read.parquet(mvDir),
        baseTag = "documents.parquet", groupCols = Seq("source", "lang"),
        sumCols = Map("n_chars" -> "sum_chars"), countCol = Some("n_rows"))

      // exact-grouping match — and a projection ON TOP of the aggregate,
      // proving rewritten aliases keep their exprIds
      val q = base.groupBy("source", "lang")
        .agg(sum("n_chars").as("total"), count(lit(1)).as("cnt"))
        .select("source", "total", "cnt")
      assert(scanPaths(q).exists(_.contains(mvDir)),
        s"expected the summary scan, got ${scanPaths(q)}")
      val plain = spark.read.parquet(baseDir).groupBy("source", "lang")
        .agg(sum("n_chars").as("total"), count(lit(1)).as("cnt"))
        .select("source", "total", "cnt")
      assert(q.collect().toSet == plain.collect().toSet && q.count() > 0)

      // subset rollup: group by source only → SUM of partial SUMs
      val roll = base.groupBy("source").agg(sum("n_chars").as("total"))
      assert(scanPaths(roll).exists(_.contains(mvDir)))
      val rollPlain = spark.read.parquet(baseDir)
        .groupBy("source").agg(sum("n_chars").as("total"))
      assert(roll.collect().toSet == rollPlain.collect().toSet)

      // global rollup (no grouping)
      val glob = base.agg(count(lit(1)).as("cnt"), sum("n_chars").as("s"))
      assert(scanPaths(glob).exists(_.contains(mvDir)))
      assert(glob.first() ==
        spark.read.parquet(baseDir).agg(count(lit(1)).as("cnt"),
          sum("n_chars").as("s")).first())

      // a filter on GROUPING columns selects whole groups → SERVED from
      // the summary, with the predicate pushed onto the |groups|-row scan
      val filtered = base.filter(col("lang") === "en")
        .groupBy("source").agg(sum("n_chars").as("total"))
      assert(scanPaths(filtered).exists(_.contains(mvDir)),
        "grouping-column filter must be served from the summary")
      val filteredPlain = spark.read.parquet(baseDir)
        .filter(col("lang") === "en")
        .groupBy("source").agg(sum("n_chars").as("total"))
      assert(filtered.collect().toSet == filteredPlain.collect().toSet &&
        filtered.count() > 0)

      // ...including compound predicates over several grouping columns
      val filtered2 = base
        .filter(col("lang").isin("en", "de") && col("source") =!= "s03")
        .groupBy("lang").agg(count(lit(1)).as("cnt"))
      assert(scanPaths(filtered2).exists(_.contains(mvDir)))
      val filtered2Plain = spark.read.parquet(baseDir)
        .filter(col("lang").isin("en", "de") && col("source") =!= "s03")
        .groupBy("lang").agg(count(lit(1)).as("cnt"))
      assert(filtered2.collect().toSet == filtered2Plain.collect().toSet)

      // guard: a filter touching a MEASURE / non-grouping column is a
      // row-level filter — group partials cannot answer it
      val rowFiltered = base.filter(col("n_chars") > 100)
        .groupBy("source").agg(sum("n_chars").as("total"))
      assert(!scanPaths(rowFiltered).exists(_.contains(mvDir)),
        "measure-column filter must NOT rewrite")

      // guard: a non-deterministic filter never rewrites (a trivially-
      // true rand() bound would be constant-folded away upstream, so the
      // predicate must be a genuine coin flip)
      val randFiltered = base.filter(rand(7) < lit(0.5))
        .groupBy("source").agg(sum("n_chars").as("total"))
      assert(!scanPaths(randFiltered).exists(_.contains(mvDir)))

      // guard: COUNT(nullable_col) skips nulls; the mv partial counts
      // ALL group rows — must NOT rewrite
      val cntNullable = base.groupBy("source").agg(count(col("lang")).as("c"))
      assert(!scanPaths(cntNullable).exists(_.contains(mvDir)),
        "count(nullable) must NOT rewrite")

      // guard: a non-algebraic measure (avg needs sum AND count pairing)
      val avgQ = base.groupBy("source").agg(avg("n_chars").as("a"))
      assert(!scanPaths(avgQ).exists(_.contains(mvDir)),
        "avg must NOT rewrite against a sum-only registration")

      // guard: an unregistered measure column
      val other = base.groupBy("source").agg(sum("doc_id").as("s"))
      assert(!scanPaths(other).exists(_.contains(mvDir)))

      // guard: a MULTI-ROOT scan (base + a second directory) must not be
      // served by a summary registered for only one of its roots
      val extraDir = Files.createTempDirectory("mv_extra").toString + "/extra.parquet"
      spark.read.parquet(baseDir).limit(7)
        .withColumn("doc_id", col("doc_id") + 500000L)
        .write.mode("overwrite").parquet(extraDir)
      val multi = session.read.parquet(baseDir, extraDir)
        .groupBy("source").agg(sum("n_chars").as("total"))
      assert(!scanPaths(multi).exists(_.contains(mvDir)),
        "multi-root scan must NOT be served from a single-root summary")
      val multiPlain = spark.read.parquet(baseDir, extraDir)
        .groupBy("source").agg(sum("n_chars").as("total"))
      assert(multi.collect().toSet == multiPlain.collect().toSet)
    } finally MvRewrite.clear()
  }

  test("AVG over a nullable measure is served via the count(x) partial; falls through without it") {
    val session = spark.newSession()
    MvRewrite.ensureRegistered(session)
    MvRewrite.clear()
    try {
      import session.implicits._
      // base with REAL nulls in the measure, incl. one all-null group
      val baseDir = java.nio.file.Files.createTempDirectory("mv_avg").toString + "/base.parquet"
      Seq(("a", Some(10L)), ("a", None), ("a", Some(20L)),
          ("b", Some(5L)), ("c", None), ("c", None))
        .toDF("grp", "x").write.mode("overwrite").parquet(baseDir)
      val base = session.read.parquet(baseDir)
      val mvDir = java.nio.file.Files.createTempDirectory("mv_avg_mv").toString
      base.groupBy("grp").agg(
        sum("x").as("sum_x"), count(col("x")).as("cnt_x"),
        count(lit(1)).as("n_rows"))
        .write.mode("overwrite").parquet(mvDir)

      // registration WITHOUT the value-count partial: avg(nullable) must
      // fall through (the row count is not avg's denominator)
      MvRewrite.register(session.read.parquet(mvDir),
        baseTag = "base.parquet", groupCols = Seq("grp"),
        sumCols = Map("x" -> "sum_x"), countCol = Some("n_rows"))
      val q0 = base.groupBy("grp").agg(avg("x").as("a"))
      assert(!scanPaths(q0).exists(_.contains(mvDir)),
        "avg(nullable) must not be served without a count(x) partial")
      MvRewrite.clear()

      // with the count(x) partial: served, answers identical (nulls
      // skipped in the mean; the all-null group stays null)
      MvRewrite.register(session.read.parquet(mvDir),
        baseTag = "base.parquet", groupCols = Seq("grp"),
        sumCols = Map("x" -> "sum_x"), countCol = Some("n_rows"),
        valueCountCols = Map("x" -> "cnt_x"))
      val q = base.groupBy("grp").agg(avg("x").as("a"), sum("x").as("s"))
      assert(scanPaths(q).exists(_.contains(mvDir)),
        s"avg should be served from the summary, got: " + scanPaths(q))
      val got = q.collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
      assert(got("a") == ((Some(15.0), Some(30L))))
      assert(got("b") == ((Some(5.0), Some(5L))))
      assert(got("c") == ((None, None)), "all-null group must stay null")
      // global avg rollup also served
      val g = base.agg(avg("x").as("a"))
      assert(scanPaths(g).exists(_.contains(mvDir)))
      assert(g.first().getDouble(0) == 35.0 / 3) // 3 non-null values
    } finally { MvRewrite.clear() }
  }

  test("COUNT over an empty selection stays 0; MIN/MAX served; CDC-retraction mart refuses MIN/MAX") {
    val session = spark.newSession()
    MvRewrite.ensureRegistered(session)
    MvRewrite.clear()
    try {
      val base = session.read.parquet(baseDir)
      val mvDir = Files.createTempDirectory("mv_minmax").toString
      base.groupBy("source", "lang")
        .agg(sum("n_chars").as("sum_chars"), count(lit(1)).as("n_rows"),
          count(col("n_chars")).as("cnt_chars"),
          min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
        .write.mode("overwrite").parquet(mvDir)
      MvRewrite.register(session.read.parquet(mvDir),
        baseTag = "documents.parquet", groupCols = Seq("source", "lang"),
        sumCols = Map("n_chars" -> "sum_chars"), countCol = Some("n_rows"),
        valueCountCols = Map("n_chars" -> "cnt_chars"),
        minCols = Map("n_chars" -> "min_chars"),
        maxCols = Map("n_chars" -> "max_chars"))

      // ADVICE r5 high: a grouping filter matching NO groups under a
      // global COUNT must stay 0 — Sum(countCol) over zero rows is NULL,
      // and the rewrite must coalesce it back to COUNT's contract
      val emptyCnt = base.filter(col("lang") === "zz_nonexistent")
        .agg(count(lit(1)).as("cnt"), sum("n_chars").as("s"))
      assert(scanPaths(emptyCnt).exists(_.contains(mvDir)),
        "empty-selection global agg should still be served")
      val r = emptyCnt.first()
      assert(r.getLong(0) == 0L, s"COUNT over empty selection must be 0, got $r")
      assert(r.isNullAt(1), "SUM over empty selection must stay NULL")

      // MIN/MAX served: exact grouping, subset rollup, global — answers
      // identical to the base scan (incl. re-MIN of partial MINs)
      for (q <- Seq(
        (df: org.apache.spark.sql.DataFrame) => df.groupBy("source", "lang")
          .agg(min("n_chars").as("lo"), max("n_chars").as("hi")),
        (df: org.apache.spark.sql.DataFrame) => df.groupBy("source")
          .agg(min("n_chars").as("lo"), max("n_chars").as("hi"),
            sum("n_chars").as("s")),
        (df: org.apache.spark.sql.DataFrame) =>
          df.agg(max("n_chars").as("hi"), min("n_chars").as("lo")))) {
        val served = q(base)
        assert(scanPaths(served).exists(_.contains(mvDir)),
          s"min/max should be served, got ${scanPaths(served)}")
        assert(served.collect().toSet ==
          q(spark.read.parquet(baseDir)).collect().toSet)
      }
      // ...and under a grouping-column filter
      val fq = base.filter(col("lang") === "en").groupBy("source")
        .agg(min("n_chars").as("lo"))
      assert(scanPaths(fq).exists(_.contains(mvDir)))
      assert(fq.collect().toSet == spark.read.parquet(baseDir)
        .filter(col("lang") === "en").groupBy("source")
        .agg(min("n_chars").as("lo")).collect().toSet)

      // guard: an UNREGISTERED min measure falls through
      val unreg = base.groupBy("source").agg(min("doc_id").as("m"))
      assert(!scanPaths(unreg).exists(_.contains(mvDir)))

      // guard: a CDC-retraction-maintained mart must NOT serve MIN/MAX
      // (non-invertible partials may be stale under deletes) — but its
      // sum/count partials, which retraction maintains exactly, still serve
      MvRewrite.clear()
      MvRewrite.register(session.read.parquet(mvDir),
        baseTag = "documents.parquet", groupCols = Seq("source", "lang"),
        sumCols = Map("n_chars" -> "sum_chars"), countCol = Some("n_rows"),
        minCols = Map("n_chars" -> "min_chars"),
        maxCols = Map("n_chars" -> "max_chars"),
        cdcRetractionOnly = true)
      val mm = base.groupBy("source").agg(min("n_chars").as("lo"))
      assert(!scanPaths(mm).exists(_.contains(mvDir)),
        "CDC-retraction mart must not serve MIN/MAX")
      val sc = base.groupBy("source").agg(sum("n_chars").as("s"),
        count(lit(1)).as("c"))
      assert(scanPaths(sc).exists(_.contains(mvDir)),
        "sum/count remain servable on a CDC-retraction mart")
      assert(sc.collect().toSet == spark.read.parquet(baseDir)
        .groupBy("source").agg(sum("n_chars").as("s"),
          count(lit(1)).as("c")).collect().toSet)
    } finally MvRewrite.clear()
  }

  test("tag matches full path components only; bad registrations fail fast") {
    val session = spark.newSession()
    MvRewrite.ensureRegistered(session)
    MvRewrite.clear()
    try {
      val base = session.read.parquet(baseDir)
      val mvDir = Files.createTempDirectory("mv_docs2").toString
      base.groupBy("source")
        .agg(sum("n_chars").as("sum_chars"), count(lit(1)).as("n_rows"))
        .write.mode("overwrite").parquet(mvDir)

      // fail fast: a registered mv-side name absent from the summary
      // schema must error at register time, never inside the optimizer
      intercept[IllegalArgumentException] {
        MvRewrite.register(session.read.parquet(mvDir),
          baseTag = "documents.parquet", groupCols = Seq("source"),
          sumCols = Map("n_chars" -> "no_such_col"), countCol = None)
      }
      intercept[IllegalArgumentException] {
        MvRewrite.register(session.read.parquet(mvDir),
          baseTag = "documents.parquet", groupCols = Seq("source"),
          sumCols = Map.empty, countCol = Some("missing_rows"))
      }

      MvRewrite.register(session.read.parquet(mvDir),
        baseTag = "documents.parquet", groupCols = Seq("source"),
        sumCols = Map("n_chars" -> "sum_chars"), countCol = Some("n_rows"))

      // a DIFFERENT table whose filename merely CONTAINS the tag as a
      // substring must not be captured ("old_documents.parquet" vs
      // "documents.parquet")
      val otherDir = Files.createTempDirectory("mv_other").toString
      val otherPath = s"$otherDir/old_documents.parquet"
      base.limit(10).write.mode("overwrite").parquet(otherPath)
      val decoy = session.read.parquet(otherPath)
        .groupBy("source").agg(sum("n_chars").as("t"))
      assert(!scanPaths(decoy).exists(_.contains(mvDir)),
        "substring-containing path must NOT be rerouted to the summary")
      assert(decoy.collect().toSet ==
        spark.read.parquet(otherPath).groupBy("source")
          .agg(sum("n_chars").as("t")).collect().toSet)

      // the genuine base still rewrites under the same registration
      val served = base.groupBy("source").agg(sum("n_chars").as("t"))
      assert(scanPaths(served).exists(_.contains(mvDir)))
    } finally MvRewrite.clear()
  }

  test("AggSink-maintained mart is served by the rewrite and tracks the stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val session = spark.newSession()
    MvRewrite.ensureRegistered(session)
    MvRewrite.clear()
    try {
      val mart = Files.createTempDirectory("mv_mart").toString
      val ckpt = Files.createTempDirectory("mv_ckpt").toString
      // feed the BASE table through the stream in two micro-batches, so
      // the exactly-once mart ends holding exactly the base's partials
      val rows = session.read.parquet(baseDir)
        .select("source", "doc_id", "n_chars").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val (b1, b2) = rows.splitAt(rows.length / 2)
      implicit val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong)
      val input = MemoryStream[(String, Long, Long)](session)
      // r9: the stream also maintains the two SKETCH partials, so the
      // rewrite serves hist_quantile reads from the stream-kept mart —
      // the full "stream maintains, rule serves" loop in one test
      graft.functions.GraftFunctions.register(session)
      val q = graft.streaming.AggSink.aggStream(
        input.toDF().toDF("source", "doc_id", "n_chars"), mart,
        keys = Seq("source"), sums = Seq("n_chars"), checkpointDir = ckpt,
        counts = Seq("n_chars"), hists = Seq("n_chars"), histWidth = 8)
      try {
        input.addData(b1.toIndexedSeq); q.processAllAvailable()
        input.addData(b2.toIndexedSeq); q.processAllAvailable()
      } finally q.stop()
      MvRewrite.register(graft.streaming.AggSink.read(session, mart),
        baseTag = "documents.parquet", groupCols = Seq("source"),
        sumCols = Map("n_chars" -> "sum_n_chars"), countCol = Some("n_rows"),
        valueCountCols = Map("n_chars" -> "cnt_n_chars"),
        histCols = Map("n_chars" -> "hist_n_chars_w8"), histWidth = 8)
      val served = session.read.parquet(baseDir).groupBy("source")
        .agg(sum("n_chars").as("total"), count(lit(1)).as("cnt"),
          avg("n_chars").as("mean"))
      assert(!scanPaths(served).exists(_.contains("documents.parquet")),
        s"must read the mart, not the base: ${scanPaths(served)}")
      val plain = spark.read.parquet(baseDir).groupBy("source")
        .agg(sum("n_chars").as("total"), count(lit(1)).as("cnt"),
          avg("n_chars").as("mean"))
      assert(served.collect().toSet == plain.collect().toSet)
      // hist_quantile over the base reroutes to the stream-maintained
      // cells and answers IDENTICALLY to the direct fixed-grid quantile
      val plainSession = spark.newSession()
      graft.functions.GraftFunctions.register(plainSession)
      def p50(df: DataFrame) = df.groupBy("source")
        .agg(call_function("hist_quantile", col("n_chars"), lit(0.5), lit(8))
          .as("p50"))
      val servedQ = p50(session.read.parquet(baseDir))
      assert(!scanPaths(servedQ).exists(_.contains("documents.parquet")),
        s"hist read must hit the stream-kept mart: ${scanPaths(servedQ)}")
      assert(servedQ.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
        == p50(plainSession.read.parquet(baseDir)).collect()
          .map(r => (r.getString(0), r.getDouble(1))).toMap)
    } finally MvRewrite.clear()
  }

  test("kmv sketch reads serve from the mart; exact COUNT DISTINCT refused (r7)") {
    val session = spark.newSession()
    graft.functions.GraftFunctions.register(session)
    MvRewrite.ensureRegistered(session)
    MvRewrite.clear()
    // the un-rewritten reference leg runs on a session WITHOUT the rule
    val plain = spark.newSession()
    graft.functions.GraftFunctions.register(plain)
    try {
      // a base carrying the hash column (sketch measures are hashed at
      // write time; the rewrite matches bare-relation columns only)
      val hDir = Files.createTempDirectory("base_hashed").toString
      session.read.parquet(baseDir)
        .withColumn("h",
          call_function("md5_prefix64", concat(lit("kmv:"), col("doc_id"))))
        .write.mode("overwrite").parquet(hDir)
      val hBase = session.read.parquet(hDir)
      val mvDir = Files.createTempDirectory("mv_kmv").toString
      hBase.groupBy("source")
        .agg(count(lit(1)).as("n_rows"),
          call_function("kmin_values", col("h"), lit(16)).as("kmv_h"))
        .write.mode("overwrite").parquet(mvDir)
      MvRewrite.register(session.read.parquet(mvDir),
        baseTag = new java.io.File(hDir).getName,
        groupCols = Seq("source"),
        sumCols = Map.empty, countCol = Some("n_rows"),
        kmvCols = Map("h" -> "kmv_h"), kmvK = 16)

      def sketchBy(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("source")
          .agg(call_function("kmin_values", col("h"), lit(16)).as("sketch"))

      // per-group: served by kmin_merge over the partials, EXACTLY equal
      // to the direct KMV over base rows (the union property)
      val served = sketchBy(hBase)
      assert(scanPaths(served).exists(_.contains(mvDir)),
        s"expected the mart scan, got ${scanPaths(served)}")
      val servedMap = served.collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val directMap = sketchBy(plain.read.parquet(hDir)).collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(servedMap === directMap, "served sketch must EQUAL direct KMV")
      assert(servedMap.nonEmpty && servedMap.values.exists(_.size == 16))

      // global rollup: merged group partials = the global k-min
      val glob = hBase.agg(
        call_function("kmin_values", col("h"), lit(16)).as("sketch"))
      assert(scanPaths(glob).exists(_.contains(mvDir)))
      assert(glob.first().getSeq[Long](0) ===
        plain.read.parquet(hDir)
          .agg(call_function("kmin_values", col("h"), lit(16)).as("sketch"))
          .first().getSeq[Long](0))

      // SUBTOTAL LATTICE (r10): the KMV union property holds under any
      // grouping — a CUBE over the hashed base serves from kmin_merge of
      // the per-group partials, sketch-for-sketch equal to direct
      def kLatt(df: org.apache.spark.sql.DataFrame) = df.cube("source")
        .agg(call_function("kmin_values", col("h"), lit(16)).as("sketch"),
          grouping_id().as("gid"))
      val servedLat = kLatt(hBase)
      assert(scanPaths(servedLat).exists(_.contains(mvDir)),
        s"cube kmv read should hit the mart, got " + scanPaths(servedLat))
      assert(servedLat.collect()
        .map(r => (Option(r.getString(0)), r.getSeq[Long](1), r.get(2))).toSet ===
        kLatt(plain.read.parquet(hDir)).collect()
          .map(r => (Option(r.getString(0)), r.getSeq[Long](1), r.get(2))).toSet)

      // k mismatch falls through to the base (a different k is a
      // different error contract — truncation would silently change it)
      val otherK = hBase.groupBy("source")
        .agg(call_function("kmin_values", col("h"), lit(8)).as("sketch"))
      assert(!scanPaths(otherK).exists(_.contains(mvDir)))

      // exact COUNT(DISTINCT x) is REFUSED by design — base scan, exact
      // answer preserved
      val exact = hBase.groupBy("source").agg(countDistinct("h").as("d"))
      assert(!scanPaths(exact).exists(_.contains(mvDir)),
        "a sketch must never serve an exact distinct")
      assert(exact.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
        plain.read.parquet(hDir).groupBy("source")
          .agg(countDistinct("h").as("d")).collect()
          .map(r => (r.getString(0), r.getLong(1))).toSet)

      // kmv serving is REFUSED on retraction-maintained marts (r9: the
      // hist refusal was lifted — cells retract exactly — but a k-min
      // order statistic cannot be un-taken, so kmv's refusal stands)
      MvRewrite.clear()
      MvRewrite.register(session.read.parquet(mvDir),
        baseTag = new java.io.File(hDir).getName,
        groupCols = Seq("source"),
        sumCols = Map.empty, countCol = Some("n_rows"),
        kmvCols = Map("h" -> "kmv_h"), kmvK = 16,
        cdcRetractionOnly = true)
      assert(!scanPaths(sketchBy(hBase)).exists(_.contains(mvDir)),
        "kmv must stay refused on retraction marts")
    } finally MvRewrite.clear()
  }

  test("hist-quantile reads serve from the mart; exact percentile refused (r8)") {
    val session = spark.newSession()
    graft.functions.GraftFunctions.register(session)
    MvRewrite.ensureRegistered(session)
    MvRewrite.clear()
    val plain = spark.newSession()
    graft.functions.GraftFunctions.register(plain)
    try {
      // the mart is MAINTAINED across batches by IncrementalAgg's hists
      // path (hist_cells partials folded with hist_merge), not built in
      // one shot — the maintain half of the loop under test
      val storeDir = Files.createTempDirectory("mv_hist").toString + "/agg"
      val base = session.read.parquet(baseDir)
      IncrementalAgg.update(session, storeDir,
        base.filter(col("doc_id") % 2 === 0), keys = Seq("source"),
        hists = Seq("n_chars"), histWidth = 8)
      IncrementalAgg.update(session, storeDir,
        base.filter(col("doc_id") % 2 === 1), keys = Seq("source"),
        hists = Seq("n_chars"), histWidth = 8)
      // a mixed-width maintenance call fails LOUDLY (the width is part
      // of the partial column name — different grids cannot merge)
      intercept[Exception] {
        IncrementalAgg.update(session, storeDir,
          base.limit(5), keys = Seq("source"),
          hists = Seq("n_chars"), histWidth = 16)
      }
      MvRewrite.register(session.read.parquet(storeDir),
        baseTag = "documents.parquet",
        groupCols = Seq("source"),
        sumCols = Map.empty, countCol = Some("n_rows"),
        histCols = Map("n_chars" -> "hist_n_chars_w8"), histWidth = 8)

      def qBy(df: DataFrame) = df.groupBy("source")
        .agg(call_function("hist_quantile", col("n_chars"), lit(0.5), lit(8))
          .as("p50"),
          call_function("hist_quantile", col("n_chars"), lit(0.99), lit(8))
            .as("p99"))

      // per-group: served by hist_quantile_merge over the maintained
      // cells, EXACTLY equal to the direct aggregate over base rows
      val served = qBy(base)
      assert(scanPaths(served).exists(_.contains(storeDir)),
        s"expected the mart scan, got ${scanPaths(served)}")
      val servedMap = served.collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      val directMap = qBy(plain.read.parquet(baseDir)).collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      assert(servedMap === directMap,
        "served quantile must EQUAL the direct fixed-grid quantile")

      // global rollup: merged group cells = the global histogram
      val glob = base.agg(
        call_function("hist_quantile", col("n_chars"), lit(0.9), lit(8))
          .as("p90"))
      assert(scanPaths(glob).exists(_.contains(storeDir)))
      assert(glob.first().getDouble(0) ===
        plain.read.parquet(baseDir).agg(
          call_function("hist_quantile", col("n_chars"), lit(0.9), lit(8))
            .as("p90")).first().getDouble(0))

      // SUBTOTAL LATTICE (r10): hist cells merge under any grouping, so
      // a ROLLUP over the base reroutes to the maintained mart and the
      // per-level quantiles equal the direct lattice bit-for-bit
      def latt(df: DataFrame) = df.rollup("source")
        .agg(call_function("hist_quantile", col("n_chars"), lit(0.5), lit(8))
          .as("p50"), grouping_id().as("gid"))
      val servedL = latt(base)
      assert(scanPaths(servedL).exists(_.contains(storeDir)),
        s"rollup hist read should hit the mart, got " + scanPaths(servedL))
      assert(servedL.collect().toSet ===
        latt(plain.read.parquet(baseDir)).collect().toSet)

      // grid-width mismatch falls through (stored cells cannot be
      // re-bucketed onto a different grid)
      val otherW = base.groupBy("source")
        .agg(call_function("hist_quantile", col("n_chars"), lit(0.5), lit(16))
          .as("p50"))
      assert(!scanPaths(otherW).exists(_.contains(storeDir)))

      // exact percentile is REFUSED — base scan, exact answer preserved
      val exact = base.groupBy("source")
        .agg(expr("percentile(n_chars, 0.5)").as("p50"))
      assert(!scanPaths(exact).exists(_.contains(storeDir)),
        "cells must never serve an exact percentile")
      assert(exact.collect().map(r => (r.getString(0), r.getDouble(1))).toSet ==
        plain.read.parquet(baseDir).groupBy("source")
          .agg(expr("percentile(n_chars, 0.5)").as("p50")).collect()
          .map(r => (r.getString(0), r.getDouble(1))).toSet)

      // Spark's approx_percentile is a DIFFERENT estimator — refused too
      val ap = base.groupBy("source")
        .agg(expr("approx_percentile(n_chars, 0.5)").as("p50"))
      assert(!scanPaths(ap).exists(_.contains(storeDir)))

      // retraction-maintained marts STILL serve quantiles (r9): histogram
      // cells retract exactly (IncrementalAgg.applyChanges' hists arm), so
      // unlike kmv there is nothing to refuse — and the served answer is
      // still identical to the direct one
      MvRewrite.clear()
      MvRewrite.register(session.read.parquet(storeDir),
        baseTag = "documents.parquet", groupCols = Seq("source"),
        sumCols = Map.empty, countCol = Some("n_rows"),
        histCols = Map("n_chars" -> "hist_n_chars_w8"), histWidth = 8,
        cdcRetractionOnly = true)
      val servedCdc = qBy(base)
      assert(scanPaths(servedCdc).exists(_.contains(storeDir)),
        "hist serving must survive cdcRetractionOnly — cells are invertible")
      assert(servedCdc.collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
        === directMap)

      // a mis-registered width that contradicts the _w<N> column-name
      // suffix fails at REGISTER time, not by silently serving wrong
      // quantiles from bucket-incompatible cells (r9 ADVICE)
      MvRewrite.clear()
      val widthErr = intercept[IllegalArgumentException] {
        MvRewrite.register(session.read.parquet(storeDir),
          baseTag = "documents.parquet", groupCols = Seq("source"),
          sumCols = Map.empty, countCol = Some("n_rows"),
          histCols = Map("n_chars" -> "hist_n_chars_w8"), histWidth = 16)
      }
      assert(widthErr.getMessage.contains("bucket-incompatible"))
    } finally MvRewrite.clear()
  }

  test("hll estimate reads serve from the mart; bare sketch and HLL++ refused (r9)") {
    val session = spark.newSession()
    MvRewrite.ensureRegistered(session)
    MvRewrite.clear()
    val plain = spark.newSession()
    try {
      // maintained across two batches by IncrementalAgg's hlls path
      val storeDir = Files.createTempDirectory("mv_hll").toString + "/agg"
      val base = session.read.parquet(baseDir)
      IncrementalAgg.update(session, storeDir,
        base.filter(col("doc_id") % 2 === 0), keys = Seq("source"),
        hlls = Seq("doc_id"), hllLgK = 12)
      IncrementalAgg.update(session, storeDir,
        base.filter(col("doc_id") % 2 === 1), keys = Seq("source"),
        hlls = Seq("doc_id"), hllLgK = 12)
      MvRewrite.register(session.read.parquet(storeDir),
        baseTag = "documents.parquet", groupCols = Seq("source"),
        sumCols = Map.empty, countCol = Some("n_rows"),
        hllCols = Map("doc_id" -> "hll_doc_id_k12"), hllLgK = 12)

      def estBy(df: DataFrame) = df.groupBy("source")
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(doc_id, 12))").as("est"))

      // per-group: served via hll_union_agg over the maintained partials.
      // The serving contract is ESTIMATOR-CLASS, not bit-equality —
      // datasketches estimates are merge-tree-variant (the DIRECT read
      // of 500 distinct values measures 500/499/502 under
      // repartition(1/32/default) on this build: HIP vs composite
      // estimator, sparse promotion order), so the pinned assertions are
      // (a) the plan reroutes, (b) the served estimate stays inside the
      // lgK=12 error contract of the EXACT count, (c) dense-regime exact
      // equality is pinned in the next test block below
      val served = estBy(base)
      assert(scanPaths(served).exists(_.contains(storeDir)),
        s"expected the mart scan, got ${scanPaths(served)}")
      val servedMap = served.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val exactMap = plain.read.parquet(baseDir).groupBy("source")
        .agg(countDistinct("doc_id").as("d")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(servedMap.keySet == exactMap.keySet)
      servedMap.foreach { case (k, est) =>
        val ex = exactMap(k).toDouble
        assert(math.abs(est - ex) <= math.max(2.0, 0.05 * ex),
          s"group $k: served $est vs exact $ex outside the lgK=12 bound")
      }

      // global rollup reroutes too, same error contract vs the exact count
      val glob = base.agg(
        expr("hll_sketch_estimate(hll_sketch_agg(doc_id, 12))").as("est"))
      assert(scanPaths(glob).exists(_.contains(storeDir)))
      val globExact = plain.read.parquet(baseDir)
        .agg(countDistinct("doc_id")).first().getLong(0).toDouble
      assert(math.abs(glob.first().getLong(0) - globExact) <=
        math.max(2.0, 0.05 * globExact))

      // DENSE regime (registers past the sparse->dense promotion point,
      // ~3/4 * 2^lgK coupons): register-max is path-independent and both
      // sides merge, so served == direct EXACTLY
      val denseDir = Files.createTempDirectory("mv_hll_dense").toString
      val denseBase = session.range(120000)
        .select((col("id") % 3).cast("string").as("source"),
          col("id").as("doc_id"))
      denseBase.write.mode("overwrite").parquet(denseDir)
      val denseStore = Files.createTempDirectory("mv_hll_ds").toString + "/agg"
      val dread = session.read.parquet(denseDir)
      IncrementalAgg.update(session, denseStore,
        dread.filter(col("doc_id") % 2 === 0), keys = Seq("source"),
        hlls = Seq("doc_id"), hllLgK = 12)
      IncrementalAgg.update(session, denseStore,
        dread.filter(col("doc_id") % 2 === 1), keys = Seq("source"),
        hlls = Seq("doc_id"), hllLgK = 12)
      MvRewrite.register(session.read.parquet(denseStore),
        baseTag = new java.io.File(denseDir).getName,
        groupCols = Seq("source"),
        sumCols = Map.empty, countCol = Some("n_rows"),
        hllCols = Map("doc_id" -> "hll_doc_id_k12"), hllLgK = 12)
      val denseServed = estBy(dread)
      assert(scanPaths(denseServed).exists(_.contains(denseStore)))
      assert(denseServed.collect().map(r => (r.getString(0), r.getLong(1))).toMap
        == estBy(plain.read.parquet(denseDir)).collect()
          .map(r => (r.getString(0), r.getLong(1))).toMap,
        "dense-regime served estimate must EQUAL the direct one")

      // lgK mismatch falls through (a different precision is a different
      // error contract; stored registers cannot be re-binned)
      val otherK = base.groupBy("source")
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(doc_id, 14))").as("est"))
      assert(!scanPaths(otherK).exists(_.contains(storeDir)))

      // the BARE sketch read is refused: serialized bytes are not
      // contract-stable across build orders even when registers are
      val bare = base.groupBy("source")
        .agg(expr("hll_sketch_agg(doc_id, 12)").as("sk"))
      assert(!scanPaths(bare).exists(_.contains(storeDir)))

      // approx_count_distinct is HyperLogLogPlusPlus — a DIFFERENT
      // estimator; refused like approx_percentile, answer preserved
      val acd = base.groupBy("source")
        .agg(approx_count_distinct("doc_id").as("d"))
      assert(!scanPaths(acd).exists(_.contains(storeDir)))
      assert(acd.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
        plain.read.parquet(baseDir).groupBy("source")
          .agg(approx_count_distinct("doc_id").as("d")).collect()
          .map(r => (r.getString(0), r.getLong(1))).toSet)

      // exact COUNT(DISTINCT x) refused by the isDistinct guard
      val exact = base.groupBy("source").agg(countDistinct("doc_id").as("d"))
      assert(!scanPaths(exact).exists(_.contains(storeDir)))

      // retraction marts refuse hll serving (registers cannot be un-maxed)
      MvRewrite.clear()
      MvRewrite.register(session.read.parquet(storeDir),
        baseTag = "documents.parquet", groupCols = Seq("source"),
        sumCols = Map.empty, countCol = Some("n_rows"),
        hllCols = Map("doc_id" -> "hll_doc_id_k12"), hllLgK = 12,
        cdcRetractionOnly = true)
      assert(!scanPaths(estBy(base)).exists(_.contains(storeDir)))

      // a mis-registered lgK contradicting the _k<N> suffix fails fast
      MvRewrite.clear()
      val lgkErr = intercept[IllegalArgumentException] {
        MvRewrite.register(session.read.parquet(storeDir),
          baseTag = "documents.parquet", groupCols = Seq("source"),
          sumCols = Map.empty, countCol = Some("n_rows"),
          hllCols = Map("doc_id" -> "hll_doc_id_k12"), hllLgK = 14)
      }
      assert(lgkErr.getMessage.contains("lgConfigK"))
    } finally MvRewrite.clear()
  }

  test("rule is inert with an empty registry and on other sessions") {
    MvRewrite.clear()
    val session = spark.newSession()
    MvRewrite.ensureRegistered(session)
    val q = session.read.parquet(baseDir)
      .groupBy("source").agg(sum("n_chars").as("t"))
    assert(scanPaths(q).forall(_.contains("documents.parquet")))
    // the GLOBAL session never had the rule installed at all
    assert(!spark.experimental.extraOptimizations.contains(MvRewrite.RewriteRule))
  }

  test("ROLLUP / CUBE / GROUPING SETS served from the same mart partials (r10)") {
    val session = spark.newSession()
    MvRewrite.ensureRegistered(session)
    MvRewrite.clear()
    try {
      val base = session.read.parquet(baseDir)
      val mvDir = Files.createTempDirectory("mv_lattice").toString
      base.groupBy("source", "lang")
        .agg(sum("n_chars").as("sum_chars"), count(lit(1)).as("n_rows"),
          count(col("n_chars")).as("cnt_chars"),
          min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
        .write.mode("overwrite").parquet(mvDir)
      MvRewrite.register(session.read.parquet(mvDir),
        baseTag = "documents.parquet", groupCols = Seq("source", "lang"),
        sumCols = Map("n_chars" -> "sum_chars"), countCol = Some("n_rows"),
        valueCountCols = Map("n_chars" -> "cnt_chars"),
        minCols = Map("n_chars" -> "min_chars"),
        maxCols = Map("n_chars" -> "max_chars"))

      // the subtotal lattice reroutes to the |groups|-row summary: the
      // mv rows ride the SAME Expand, partials re-aggregate per grouping
      // set. Answers — including the grouping()/grouping_id() flags,
      // which disambiguate a NULL group value from a rolled-up level —
      // must be bit-identical to the base-scan lattice.
      def lattice(df: DataFrame) = df.rollup("source", "lang")
        .agg(sum("n_chars").as("t"), count(lit(1)).as("c"),
          avg("n_chars").as("a"), min("n_chars").as("lo"),
          max("n_chars").as("hi"),
          grouping("lang").as("g_lang"), grouping_id().as("gid"))
      val served = lattice(base)
      assert(scanPaths(served).exists(_.contains(mvDir)),
        s"rollup should be served from the summary, got " + scanPaths(served))
      assert(served.collect().toSet ==
        lattice(spark.read.parquet(baseDir)).collect().toSet)
      assert(served.count() > 0)

      def cubed(df: DataFrame) = df.cube("source", "lang")
        .agg(sum("n_chars").as("t"), count(lit(1)).as("c"))
      val servedCube = cubed(base)
      assert(scanPaths(servedCube).exists(_.contains(mvDir)))
      assert(servedCube.collect().toSet ==
        cubed(spark.read.parquet(baseDir)).collect().toSet)

      // GROUPING SETS via SQL over the same scan
      base.createOrReplaceTempView("lattice_docs")
      spark.read.parquet(baseDir).createOrReplaceTempView("lattice_docs_plain")
      def gsets(s: org.apache.spark.sql.SparkSession, t: String) =
        s.sql(s"""SELECT source, lang, sum(n_chars) AS t, count(1) AS c
                  FROM $t GROUP BY GROUPING SETS ((source, lang), (source), ())""")
      val servedGs = gsets(session, "lattice_docs")
      assert(scanPaths(servedGs).exists(_.contains(mvDir)),
        s"grouping sets should be served, got " + scanPaths(servedGs))
      assert(servedGs.collect().toSet ==
        gsets(spark, "lattice_docs_plain").collect().toSet)

      // grouping-column filter composes: it moves below the Expand onto
      // the |groups|-row scan
      def fRoll(df: DataFrame) = df.filter(col("lang") === "en")
        .rollup("source").agg(sum("n_chars").as("t"), count(lit(1)).as("c"))
      val servedF = fRoll(base)
      assert(scanPaths(servedF).exists(_.contains(mvDir)),
        "filtered rollup should be served")
      assert(servedF.collect().toSet ==
        fRoll(spark.read.parquet(baseDir)).collect().toSet)

      // PARTIAL LATTICE SPLIT-SERVE (r11, VERDICT r10 #4 — the common
      // dashboard case): a rollup over (source, doc_id) against an mv
      // grouped on (source, lang) splits — the (source) and () sets
      // reroute to the mart, the (source, doc_id) set stays on the
      // base. Grouping sets are disjoint groups (the grouping id is a
      // grouping key), so a bag union of the two Aggregates is the
      // original answer row-for-row — still "never change answers".
      def partial(df: DataFrame) = df.rollup("source", "doc_id")
        .agg(sum("n_chars").as("t"), count(lit(1)).as("c"),
          grouping("doc_id").as("g_doc"), grouping_id().as("gid"))
      val split = partial(base)
      assert(scanPaths(split).exists(_.contains(mvDir)),
        s"servable sets of a partial lattice must hit the mart, got " +
          scanPaths(split))
      assert(scanPaths(split).exists(_.contains("documents.parquet")),
        "the unservable set must stay on the base scan")
      // plan-asserted split shape: a Union whose base-branch Expand
      // carries exactly the one unservable projection and whose mart
      // branch carries the two servable ones
      import org.apache.spark.sql.catalyst.plans.logical.{Expand => LExpand, Union => LUnion}
      val opt = split.queryExecution.optimizedPlan
      assert(opt.collect { case u: LUnion => u }.nonEmpty,
        "the split must plan as a Union of two Aggregates")
      val expandSizes = opt.collect { case e: LExpand => e.projections.size }
        .sorted
      assert(expandSizes === Seq(1, 2),
        s"split must route 2 sets to the mart and 1 to the base, got $expandSizes")
      assert(split.collect().toSet ==
        partial(spark.read.parquet(baseDir)).collect().toSet,
        "split-served partial lattice must be bit-identical to the base scan")

      // a grouping-column filter composes under the split: the mart
      // branch rebases it onto the |groups|-row scan, the base branch
      // keeps its original filtered child verbatim
      def fPartial(df: DataFrame) = df.filter(col("source").isNotNull)
        .rollup("source", "doc_id").agg(sum("n_chars").as("t"))
      val splitF = fPartial(base)
      assert(scanPaths(splitF).exists(_.contains(mvDir)),
        "filtered partial lattice must still split-serve")
      assert(splitF.collect().toSet ==
        fPartial(spark.read.parquet(baseDir)).collect().toSet)

      // FULL REFUSAL retained when NOTHING is servable: every grouping
      // set touches the non-mv column
      def noneServable(s: org.apache.spark.sql.SparkSession, t: String) =
        s.sql(s"""SELECT source, doc_id, sum(n_chars) AS t FROM $t
                  GROUP BY GROUPING SETS ((source, doc_id), (doc_id))""")
      val refusedAll = noneServable(session, "lattice_docs")
      assert(!scanPaths(refusedAll).exists(_.contains(mvDir)),
        "a lattice with no servable set must NOT rewrite")
      assert(refusedAll.collect().toSet ==
        noneServable(spark, "lattice_docs_plain").collect().toSet)

      // measure-column filter refuses under a lattice exactly as flat
      val rowFiltered = base.filter(col("n_chars") > 100)
        .rollup("source").agg(sum("n_chars").as("t"))
      assert(!scanPaths(rowFiltered).exists(_.contains(mvDir)))

      // unregistered measure refuses
      val unreg = base.rollup("source").agg(sum("doc_id").as("t"))
      assert(!scanPaths(unreg).exists(_.contains(mvDir)))

      // (q22_rollup / q26_cube / q39_grouping_sets are untouched by
      // construction: the Verify surface never registers an mv, and the
      // rule is a no-op on an empty registry — their oracle rows stay
      // the proof)
    } finally MvRewrite.clear()
  }

  test("degenerate lattice shape: every projection nulls the non-mv column" +
      " -> mart-only, no Union (r12, VERDICT r11 #7)") {
    // The onBase.isEmpty guard in splitServeExpand is defense-in-depth:
    // classifySlots makes the empty-base partition unreachable (an
    // unservable slot is AttrSlot only when some projection CARRIES the
    // attribute, and that projection lands on the base side). This spec
    // pins the adjacent reachable shape the guard documents: an Expand
    // whose every projection nulls the non-mv column — hand-built, the
    // analyzer never emits it — classifies that slot LitSlot and must be
    // served ENTIRELY from the mart (full-rewrite path), producing no
    // Union and no degenerate empty-projection base branch.
    val session = spark.newSession()
    MvRewrite.ensureRegistered(session)
    MvRewrite.clear()
    try {
      val base = session.read.parquet(baseDir)
      val mvDir = Files.createTempDirectory("mv_degenerate").toString
      base.groupBy("source", "lang")
        .agg(sum("n_chars").as("sum_chars"), count(lit(1)).as("n_rows"))
        .write.mode("overwrite").parquet(mvDir)
      MvRewrite.register(session.read.parquet(mvDir),
        baseTag = "documents.parquet", groupCols = Seq("source", "lang"),
        sumCols = Map("n_chars" -> "sum_chars"), countCol = Some("n_rows"))

      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Expand => LExpand, Union => LUnion}
      // rollup(source, doc_id) plans 3 projections, exactly one carrying
      // doc_id; stripping that one by hand leaves doc_id's slot nulled
      // in every surviving projection
      def lattice(df: DataFrame) = df.rollup("source", "doc_id")
        .agg(sum("n_chars").as("t"), count(lit(1)).as("c"))
      def prune(plan: LogicalPlan): LogicalPlan = plan.transformUp {
        case e: LExpand =>
          // doc_id appears twice in the Expand output: the child
          // passthrough (never nulled) and the duplicated grouping
          // attr (nulled in the sets that drop it) — prune on the
          // grouping copy only
          val docIdx = e.output.indices.filter(i =>
            e.output(i).name.contains("doc_id") &&
              e.projections.exists(p => p(i) match {
                case Literal(null, _) => true
                case _ => false
              }))
          assert(docIdx.nonEmpty)
          e.copy(projections = e.projections.filter(p =>
            docIdx.forall(i => p(i) match {
              case Literal(null, _) => true
              case _ => false
            })))
      }
      val pruned = prune(lattice(base).queryExecution.analyzed)
      val rewritten = MvRewrite.RewriteRule(pruned)
      assert(rewritten.collect { case u: LUnion => u }.isEmpty,
        "nothing for a base branch: must serve mart-only, not Union")
      val sizes = rewritten.collect { case e: LExpand => e.projections.size }
      assert(sizes === Seq(2),
        s"both surviving sets ride the one mart Expand, got $sizes")
      import org.apache.spark.sql.graft.ClassicBridge
      val served = ClassicBridge.ofRows(session, rewritten)
      assert(scanPaths(served).exists(_.contains(mvDir)) &&
        !scanPaths(served).exists(_.contains("documents.parquet")),
        s"must scan the mart only, got " + scanPaths(served))
      val plain = ClassicBridge.ofRows(spark,
        prune(lattice(spark.read.parquet(baseDir)).queryExecution.analyzed))
      assert(served.collect().toSet == plain.collect().toSet,
        "the hand-pruned lattice must answer identically from the mart")
    } finally MvRewrite.clear()
  }
}
