package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mars.Incremental
import graft.plans.MvRewrite
import graft.streaming.{AggSink, SnapshotSink, StreamingCuration}
import graft.text.CurationPipeline

/** The system-level composition a 100 TB operator actually runs — the
  * three individually-spec'd closed loops working as ONE system:
  *
  *   StreamingCuration admits documents (shared gates + near-dup veto)
  *   → AggSink maintains a per-source corpus-stats mart, batch id
  *     inside the same atomic snapshot commit
  *   → MvRewrite serves the dashboard aggregate FROM the mart, the
  *     corpus scan never runs
  *   → a takedown (deleteWhere) + vacuum flows through: the source
  *     disappears from the served dashboard and its pre-takedown
  *     versions are unreadable.
  *
  * The invariants this adds over the per-loop specs: replay of the last
  * batch is a no-op at EVERY layer (corpus, mart version chain, served
  * answers), and the mart the dashboard reads is byte-identical to a
  * from-scratch batch rebuild over the admitted corpus.
  */
class LakehouseLoopSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("lakeloop").toString

  // three independent full-pipeline survivors with ≥ 2 distinct sources
  // (the takedown needs a source that does not empty the mart)
  private lazy val (okA, okB, okC) = {
    val sfDocs = Tables.documents(spark, "/root/testdata/sf0.001")
    val base = CurationPipeline.run(sfDocs, sfDocs.limit(0))
    val rows = base.curated.select("text", "lang", "source")
      .as[(String, String, String)].head(80)
    base.unpersist()
    val a = rows.head
    val b = rows.find(_._1.split(" ").head != a._1.split(" ").head).get
    val c = rows.find(r => r._3 != a._3 &&
      r._1.split(" ").head != a._1.split(" ").head &&
      r._1.split(" ").head != b._1.split(" ").head).get
    (a, b, c)
  }

  private def doc(id: Long, text: String, meta: (String, String, String)) =
    (id, text, meta._2, meta._3, text.length.toLong)

  private def df(rows: (Long, String, String, String, Long)*) =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  private def nearDupOf(text: String): String = {
    val toks = text.split(" ")
    val idx = toks.indexWhere(_.length >= 7) match {
      case -1 => toks.length / 2
      case i => i
    }
    toks.updated(idx, "zzzzzzz").mkString(" ")
  }

  private def scanPaths(q: DataFrame): Seq[String] =
    q.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.mkString(",")
        case _ => ""
      }
    }

  test("curated ingest → exactly-once mart → MV-served dashboard → takedown + vacuum") {
    val corpus = tmp(); val store = tmp(); val mart = tmp() + "/mart"

    // the composed per-batch step: admission, then the mart fold over
    // exactly the rows admission let through. Both layers carry their
    // own replay guard, so a crash BETWEEN them replays into a pair of
    // no-op/apply that converges to the same state.
    def step(batch: DataFrame, id: Long): Unit = {
      StreamingCuration.applyBatch(batch, id, corpus, store)
      val admitted = spark.read.parquet(s"$corpus/documents")
        .join(batch.select("doc_id"), "doc_id")
      AggSink.applyBatch(admitted, id, mart, keys = Seq("source"),
        sums = Seq("n_chars"), counts = Seq("n_chars"))
    }

    // batch 0: two clean docs + one braced doc (gated out pre-admission)
    step(df(doc(1L, okA._1, okA), doc(2L, okC._1, okC),
      doc(3L, okA._1 + " {x", okA)), 0L)
    // batch 1: near-dup of doc 1 (vetoed by the persisted band store) +
    // one new clean doc
    step(df(doc(10L, nearDupOf(okA._1), okA), doc(11L, okB._1, okB)), 1L)

    val corpusDocs = spark.read.parquet(s"$corpus/documents")
    assert(corpusDocs.select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L, 11L), "gates + near-dup veto decide admission")

    // the mart is byte-identical to a from-scratch batch rebuild over
    // the admitted corpus, and the last batch id rode the commit
    def rebuildOver(docs: DataFrame) = docs.groupBy("source")
      .agg(count(lit(1)).as("n_rows"), sum("n_chars").as("sum_n_chars"),
        count(col("n_chars")).as("cnt_n_chars"))
    assert(AggSink.read(spark, mart).collect().toSet ==
      rebuildOver(corpusDocs).collect().toSet)
    assert(SnapshotSink.lastBatchId(spark, mart) == 1L)
    val versionsBefore = Incremental.currentSnapshot(spark, mart).get

    // the dashboard aggregate is SERVED from the |sources|-row mart —
    // the admitted corpus never scans — and the answers are identical
    val session = spark.newSession()
    MvRewrite.ensureRegistered(session)
    MvRewrite.clear()
    try {
      def register(): Unit = MvRewrite.register(
        AggSink.read(session, mart), baseTag = "documents",
        groupCols = Seq("source"),
        sumCols = Map("n_chars" -> "sum_n_chars"), countCol = Some("n_rows"),
        valueCountCols = Map("n_chars" -> "cnt_n_chars"))
      register()
      def dashboard(s: org.apache.spark.sql.SparkSession) =
        s.read.parquet(s"$corpus/documents").groupBy("source")
          .agg(sum("n_chars").as("total_chars"), count(lit(1)).as("n_docs"),
            avg("n_chars").as("mean_chars"))
      val served = dashboard(session)
      assert(!scanPaths(served).exists(_.contains(corpus)),
        s"dashboard must read the mart, not the corpus: ${scanPaths(served)}")
      assert(served.collect().toSet == dashboard(spark).collect().toSet)

      // replaying the last batch is a no-op at EVERY layer: corpus rows,
      // mart version chain, and the served dashboard
      assert(StreamingCuration.applyBatch(
        df(doc(10L, nearDupOf(okA._1), okA), doc(11L, okB._1, okB)),
        1L, corpus, store) == ((0L, 0L, 0L)))
      assert(!AggSink.applyBatch(
        spark.read.parquet(s"$corpus/documents"), 1L, mart,
        keys = Seq("source"), sums = Seq("n_chars"), counts = Seq("n_chars")))
      assert(Incremental.currentSnapshot(spark, mart).get == versionsBefore,
        "replay must not publish a new mart version")
      assert(spark.read.parquet(s"$corpus/documents").count() == 3)
      assert(dashboard(session).collect().toSet ==
        dashboard(spark).collect().toSet)

      // takedown: the first doc's source leaves the serving mart; vacuum
      // expires every pre-takedown version (VACUUM-after-DELETE — only
      // then is the takedown complete)
      val taken = okA._3
      val removed = Incremental.deleteWhere(spark, mart,
        col("source") === taken)
      assert(removed >= 1, "the taken-down source had a mart row")
      Incremental.vacuum(spark, mart, keep = 1)
      val preVersion = versionsBefore.stripPrefix("v").toInt
      intercept[IllegalArgumentException] {
        Incremental.readVersion(spark, mart, preVersion)
      }
      // the dashboard now serves from the post-takedown mart (fresh
      // registration — the old one was pinned to the vacuumed version)
      MvRewrite.clear()
      register()
      val after = dashboard(session)
      assert(!scanPaths(after).exists(_.contains(corpus)))
      val expected = dashboard(spark).collect()
        .filter(_.getString(0) != taken).toSet
      assert(after.collect().toSet == expected,
        "served dashboard must equal the rebuild minus the taken source")
      assert(!after.select("source").as[String].collect().contains(taken))
    } finally MvRewrite.clear()
  }
}
