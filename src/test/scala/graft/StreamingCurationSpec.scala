package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingCuration
import graft.text.{CurationGates, CurationPipeline}

/** StreamingCuration — the per-micro-batch face of the batch pipeline:
  * shared stage-1 gates, then near-dup admission against the persisted
  * band store, with batch-keyed audit rows and replay idempotence.
  */
class StreamingCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("stream_cur").toString

  // two independent full-pipeline survivors: their (text, lang, source)
  // pass every stage-1 gate by construction
  private lazy val (okA, okB) = {
    val sfDocs = Tables.documents(spark, "/root/testdata/sf0.001")
    val base = CurationPipeline.run(sfDocs, sfDocs.limit(0))
    val rows = base.curated.select("text", "lang", "source")
      .as[(String, String, String)].head(50)
    base.unpersist()
    // pick two survivors that are NOT near-dups of each other: different
    // first tokens is a cheap sufficient filter on this corpus
    val a = rows.head
    val b = rows.find(_._1.split(" ").head != a._1.split(" ").head).get
    (a, b)
  }

  private def doc(id: Long, text: String, meta: (String, String, String)) =
    (id, text, meta._2, meta._3, text.length.toLong)

  private def df(rows: (Long, String, String, String, Long)*) =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  /** Gate-passing survivors of okA's language family with pairwise
    * distinct first tokens (so they are not near-dups of each other) —
    * the fixture both line-df tests draw from. */
  private lazy val family: Seq[(String, String, String)] = {
    val sfDocs = Tables.documents(spark, "/root/testdata/sf0.001")
    val base = CurationPipeline.run(sfDocs, sfDocs.limit(0))
    val fam = base.curated.select("text", "lang", "source")
      .as[(String, String, String)].collect()
      .filter(r => r._2 == okA._2)
    base.unpersist()
    fam.groupBy(_._1.split(" ").head).map(_._2.head).toSeq
  }

  /** One interior long token swapped — still gate-passing, but a shingle
    * near-dup of the original. */
  private def nearDupOf(text: String): String = {
    val toks = text.split(" ")
    val idx = toks.indexWhere(_.length >= 7) match {
      case -1 => toks.length / 2
      case i => i
    }
    toks.updated(idx, "zzzzzzz").mkString(" ")
  }

  test("gates + near-dup admission compose; replay is a no-op; audit persists") {
    val corpus = tmp(); val store = tmp()
    // fixture sanity: the survivors and the near-dup variant pass the
    // gates; the braced variant fails (c4 code filter)
    val probe = df(doc(1L, okA._1, okA), doc(2L, okA._1 + " {x", okA),
      doc(3L, nearDupOf(okA._1), okA), doc(4L, okB._1, okB))
    val gatedIds = CurationGates.gate(probe)
      .select("doc_id").as[Long].collect().toSet
    assert(gatedIds == Set(1L, 3L, 4L), s"fixture gates: $gatedIds")

    // batch 0: one clean doc + one braced doc — the braced one is gated
    // out BEFORE admission ever sees it
    val b0 = df(doc(1L, okA._1, okA), doc(2L, okA._1 + " {x", okA))
    assert(StreamingCuration.applyBatch(b0, 0L, corpus, store) == ((1L, 1L, 0L)))
    val kept0 = spark.read.parquet(s"$corpus/documents")
      .select("doc_id").as[Long].collect().toSet
    assert(kept0 == Set(1L))

    // batch 1: a near-dup of the ADMITTED doc is vetoed by the persisted
    // store; an unrelated gate-passing doc is admitted
    val b1 = df(doc(10L, nearDupOf(okA._1), okA), doc(11L, okB._1, okB))
    assert(StreamingCuration.applyBatch(b1, 1L, corpus, store) == ((2L, 1L, 1L)))
    val kept1 = spark.read.parquet(s"$corpus/documents")
      .select("doc_id").as[Long].collect().toSet
    assert(kept1 == Set(1L, 11L))

    // audit rows: one per batch, batch-path-keyed
    val audit = spark.read.parquet(s"$store/audit")
      .select(col("batch_id").cast("long"), col("n_input"), col("n_gated"),
        col("n_admitted"), col("n_rejected_near_dup"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(audit(0L) == ((2L, 1L, 1L, 0L)))
    assert(audit(1L) == ((2L, 2L, 1L, 1L)))

    // replay of batch 1: marker short-circuits BEFORE gating; corpus and
    // audit rows unchanged
    assert(StreamingCuration.applyBatch(b1, 1L, corpus, store) == ((0L, 0L, 0L)))
    assert(spark.read.parquet(s"$corpus/documents").count() == 2)
    val audit2 = spark.read.parquet(s"$store/audit")
      .filter(col("batch_id") === 1).select("n_admitted")
      .as[Long].collect().toSeq
    assert(audit2 == Seq(1L), "replay must not rewrite the audit row")
  }

  test("stage 1.5: cumulative line-df drops boilerplate at admission time") {
    val corpus = tmp(); val store = tmp()
    // five gate-passing survivors of ONE (lang, source) family, pairwise
    // distinct first tokens (the same non-near-dup heuristic as okA/okB)
    val five = family.take(5)
    assert(five.size == 5, s"fixture needs 5 survivors, got ${five.size}")
    // the boilerplate line: same-language words, so the combined doc
    // still passes the lang and word-shape gates
    val boiler = okA._1.split(" ").take(6).mkString(" ")
    val texts = five.map(_._1 + "\n" + boiler)
    def d(i: Int, id: Long) =
      (id, texts(i), five(i)._2, five(i)._3, texts(i).length.toLong)

    // batches 0 (docs 1,2) and 1 (docs 3,4): the line's cumulative df
    // crosses maxDocs=3 DURING batch 1, so batch-0 docs keep it (admitted
    // clean at the time) and batch-1 docs lose it
    assert(StreamingCuration.applyBatch(df(d(0, 1L), d(1, 2L)), 0L,
      corpus, store) == ((2L, 2L, 0L)))
    assert(StreamingCuration.applyBatch(df(d(2, 3L), d(3, 4L)), 1L,
      corpus, store) == ((2L, 2L, 0L)))
    val stored = spark.read.parquet(s"$corpus/documents")
      .select("doc_id", "text", "n_chars")
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(stored(1L)._2 == texts(0), "batch-0 doc keeps the line")
    assert(stored(3L)._2 == five(2)._1, "batch-1 doc loses the line")
    assert(stored(4L)._2 == five(3)._1)
    assert(stored(3L)._3 == five(2)._1.length.toLong,
      "n_chars recomputed from the rewritten text")

    // audit funnel columns
    val audit = spark.read.parquet(s"$store/audit")
      .select(col("batch_id").cast("long"), col("n_line_touched"),
        col("n_dropped_empty"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(audit(0L) == ((0L, 0L)))
    assert(audit(1L) == ((2L, 0L)))

    // batch 2 sees the (now) boilerplate line too
    assert(StreamingCuration.applyBatch(df(d(4, 5L)), 2L,
      corpus, store) == ((1L, 1L, 0L)))
    assert(spark.read.parquet(s"$corpus/documents")
      .filter(col("doc_id") === 5L).select("text").as[String].head ==
      five(4)._1)

    // cumulative df is served by the LSM fold (snapshot ∪ un-subsumed
    // deltas — below the compaction floor that is deltas alone); replay
    // overwrites its delta, never double-counts
    val hB = graft.text.TextOps.lineHashCounts(
      Seq((9L, boiler)).toDF("doc_id", "text")).select("h").as[Long].head()
    def dfOfB = StreamingCuration.lineDf(spark, store)
      .filter(col("h") === hB).agg(sum("n_docs")).as[Long].head()
    assert(dfOfB == 5L)
    assert(StreamingCuration.applyBatch(df(d(2, 3L), d(3, 4L)), 1L,
      corpus, store) == ((0L, 0L, 0L)))
    assert(dfOfB == 5L, "replayed batch must not double-count line df")
    assert(spark.read.parquet(s"$corpus/documents").count() == 5)
  }

  test("stage 1.5 LSM: per-batch writes ∝ batch (amortized), admission unchanged, replay + retention guards (r8)") {
    val corpus = tmp(); val store = tmp()
    // eight single-doc batches, every doc carrying the same candidate
    // boilerplate line: b0-b3 are distinct survivors (admitted), b4-b7
    // REUSE b0-b3's texts (near-dup-vetoed — but line df counts from
    // the GATED batch, so the store keeps growing either way)
    val four = family.slice(5, 9)
    assert(four.size == 4, s"fixture needs 4 more survivors, got ${four.size}")
    val boiler = okA._1.split(" ").take(6).mkString(" ")
    val mkText = (i: Int) => four(i % 4)._1 + "\n" + boiler
    val hB = graft.text.TextOps.lineHashCounts(
      Seq((9L, boiler)).toDF("doc_id", "text")).select("h").as[Long].head()

    val snapDirF = new java.io.File(s"$store/linedf_snap")
    def snapsNow: Set[String] =
      Option(snapDirF.list()).getOrElse(Array.empty)
        .filter(_.startsWith("v=")).toSet
    var snapRowsWritten = 0L  // S: rows written to snapshots, at write time
    var deltaRowsWritten = 0L // D: rows written as deltas
    var nonCompacting = 0
    // cadence under test: compactMinRows=1, factor=1.0 (compact when
    // deltas outgrow the snapshot); final batch forces a compaction
    // (factor=0) so retention + the tombstone are exercised
    for (b <- 0 to 7) {
      val before = snapsNow
      val t = mkText(b)
      val meta = four(b % 4)
      val batchDf = df((100L + b, t, meta._2, meta._3, t.length.toLong))
      StreamingCuration.applyBatch(batchDf, b.toLong,
        corpus, store, compactMinRows = 1L,
        compactFactor = if (b == 7) 0.0 else 1.0)
      // delta size re-derived independently (the store may prune its
      // own delta the moment a compaction subsumes it)
      deltaRowsWritten += graft.text.TextOps.lineHashCounts(
        CurationGates.gate(batchDf)).count()
      val created = snapsNow -- before
      if (created.isEmpty) nonCompacting += 1
      created.foreach { v =>
        snapRowsWritten += spark.read.parquet(s"$store/linedf_snap/$v").count()
      }
    }
    // the write-side bound (the r7 residual): non-compaction batches
    // write NOTHING under linedf_snap (counted structurally above), and
    // total snapshot rows written across the lifetime is amortized-O(D)
    // — never O(keys) per batch
    assert(nonCompacting >= 2, s"size-ratio cadence must skip compaction " +
      s"on some batches (skipped $nonCompacting of 8)")
    assert(snapRowsWritten <= 3 * deltaRowsWritten,
      s"amortized write bound: S=$snapRowsWritten D=$deltaRowsWritten")

    // cumulative df is exact through vetoes and compactions
    def dfOfB = StreamingCuration.lineDf(spark, store)
      .filter(col("h") === hB).agg(sum("n_docs")).as[Long].head()
    assert(dfOfB == 8L)

    // admission byte-identical to the eager-fold implementation:
    // cumulative df crossed lineMaxDocs=3 during batch 3, so batch-3's
    // doc lost the line, every earlier doc kept it, and b4-b7 were
    // vetoed (their originals are already in the corpus)
    val stored = spark.read.parquet(s"$corpus/documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(stored.keySet == Set(100L, 101L, 102L, 103L))
    assert(stored(100L) == mkText(0))
    assert(stored(102L) == mkText(2))
    assert(stored(103L) == four(3)._1,
      "batch-3 doc must lose the line the moment cumulative df crosses")
    val touched = spark.read.parquet(s"$store/audit")
      .select(col("batch_id").cast("long"), col("n_line_touched"))
      .as[(Long, Long)].collect().toMap
    assert((0L to 7L).map(touched) == Seq(0L, 0L, 0L, 1L, 1L, 1L, 1L, 1L))

    // store is BOUNDED: ≤ keepVersions snapshots, deltas only above the
    // oldest kept version, tombstone records the pruned horizon
    val snaps = snapsNow.toSeq.sorted
    assert(snaps.size <= 2, s"snapshots: $snaps")
    val tomb = Option(snapDirF.list()).get.filter(_.startsWith("_pruned_thru_"))
    assert(tomb.length == 1, s"tombstone: ${tomb.toSeq}")

    // crash-mid-batch replay: clearing the last marker forces a full
    // re-run, which folds onto the snapshot strictly below + the kept
    // deltas and lands byte-identically (no double-count, corpus same)
    val marker = new java.io.File(s"$store/_applied/batch-7")
    assert(marker.exists); marker.delete()
    StreamingCuration.applyBatch(
      df((107L, mkText(7), four(3)._2, four(3)._3, mkText(7).length.toLong)),
      7L, corpus, store, compactMinRows = 1L, compactFactor = 0.0)
    assert(dfOfB == 8L, "replayed fold must not double-count")
    assert(spark.read.parquet(s"$corpus/documents").count() == 4)

    // the doubly-degraded edge (r8 guard): a replay below the pruned
    // retention horizon REFUSES instead of silently under-counting df
    new java.io.File(s"$store/_applied/batch-0").delete()
    val ex = intercept[IllegalStateException] {
      StreamingCuration.applyBatch(
        df((100L, mkText(0), four(0)._2, four(0)._3, mkText(0).length.toLong)),
        0L, corpus, store, compactMinRows = 1L)
    }
    assert(ex.getMessage.contains("refusing") ||
      ex.getMessage.contains("under-count"), ex.getMessage)
    assert(dfOfB == 8L, "refused replay must not touch the store")
  }

  test("pre-snapshot stores upgrade on the first fold (legacy deltas collapse once)") {
    val corpus = tmp(); val store = tmp()
    val boiler = okA._1.split(" ").take(6).mkString(" ")
    val mkText = (i: Int) => okB._1 + s" upgtoken$i\n" + boiler
    // simulate the r6-era store: two delta partitions, NO snapshot
    for (b <- 0 to 1) {
      val t = mkText(b)
      graft.text.TextOps.lineHashCounts(
        graft.text.CurationGates.gate(
          df((200L + b, t, okB._2, okB._3, t.length.toLong))))
        .write.mode("overwrite").parquet(s"$store/linedf/batch_id=$b")
    }
    // first post-upgrade COMPACTION: the fold must absorb the legacy
    // deltas (cumulative df = 3 including its own), then prune every
    // delta the new snapshot subsumes — the one O(history) fold, once
    val t2 = mkText(2)
    StreamingCuration.applyBatch(
      df((202L, t2, okB._2, okB._3, t2.length.toLong)), 2L, corpus, store,
      compactMinRows = 1L)
    val hB = graft.text.TextOps.lineHashCounts(
      Seq((9L, boiler)).toDF("doc_id", "text")).select("h").as[Long].head()
    val snapDf = spark.read.parquet(s"$store/linedf_snap/v=2")
      .filter(col("h") === hB).agg(sum("n_docs")).as[Long].head()
    assert(snapDf == 3L, "legacy deltas must fold into the first version")
    val deltas = new java.io.File(s"$store/linedf").list()
      .filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(deltas.isEmpty, s"legacy deltas pruned (all subsumed): $deltas")
    // and BELOW the compaction floor the store keeps serving correct
    // cumulative df from (snapshot ∪ new deltas) without re-compacting
    val t3 = mkText(3)
    StreamingCuration.applyBatch(
      df((203L, t3, okB._2, okB._3, t3.length.toLong)), 3L, corpus, store)
    val cum = StreamingCuration.lineDf(spark, store)
      .filter(col("h") === hB).agg(sum("n_docs")).as[Long].head()
    assert(cum == 4L)
    assert(!new java.io.File(s"$store/linedf_snap/v=3").exists,
      "below the floor no snapshot is written")
  }

  /** The r9 composed-parity contract (VERDICT r8 "Next round" #5): the
    * BATCH pipeline on a corpus vs the stream replaying the same corpus
    * in id-ordered batches must agree on the admitted set and on every
    * admitted text, EXCEPT the one inherent divergence: a boilerplate
    * line whose document-frequency crosses `lineMaxDocs` mid-stream is
    * kept by documents admitted BEFORE the crossing batch (they were
    * clean when admitted; the stream does not rewrite history) and
    * removed from every document in the batch pipeline (which counts df
    * over the whole corpus in one pass). A later-batch doc being
    * admitted before its earlier near-dup arrives is NOT a divergence
    * here — batches are id-ordered and both sides keep the minimum id
    * (batch: min-id canonical; stream: first arrival). Decontamination
    * is excluded from the comparison by passing an empty benchmark —
    * the stream deliberately scrubs on read paths, not at admission. */
  test("composed parity: streamed replay ≡ batch pipeline on a 97-doc corpus, divergence = mid-stream line-df crossing only") {
    val corpus = tmp(); val store = tmp()
    val boiler = okA._1.split(" ").take(6).mkString(" ")
    // exclude okA/okB from the boiler carriers: the exact-dup pair
    // reuses okA's text and the near-dup pair okB's, and a carrier built
    // on the same base would be a near-dup of those crafted docs
    val five = family.filter(t => t._1 != okA._1 && t._1 != okB._1).take(5)
    assert(five.size == 5)
    // fillers: distinct curated survivors of the full sf0.001 run (near-
    // dup-free and boilerplate-free by that run's construction), minus
    // every text a crafted doc builds on
    val excluded = (five.map(_._1) :+ okA._1 :+ okB._1).toSet
    val fillers = {
      val sfDocs = Tables.documents(spark, "/root/testdata/sf0.001")
      val base = CurationPipeline.run(sfDocs, sfDocs.limit(0))
      val rows = base.curated.select("text", "lang", "source")
        .as[(String, String, String)].collect()
      base.unpersist()
      val originals = rows.groupBy(_._1).map(_._2.head)
        .filterNot(r => excluded(r._1)).toSeq.sortBy(_._1)
      // sf0.001 yields ~65 distinct survivors; pad to 87 with half-length
      // token ROTATIONS — same word multiset (every row-local gate scores
      // identically) but disjoint shingle sets (rotation rewrites every
      // 3-gram except the wrap seam), so a rotation is near-dup of
      // nothing, its base included
      val rotated = originals.map { case (t, l, s) =>
        val toks = t.split(" "); val r = toks.length / 2
        ((toks.drop(r) ++ toks.take(r)).mkString(" "), l, s)
      }
      (originals ++ rotated).take(87)
    }
    assert(fillers.size == 87, s"fixture needs 87 fillers, got ${fillers.size}")
    assert(fillers.map(_._1).distinct.size == 87)

    // crafted docs: 5 boiler carriers (df crosses 3 during the last
    // batch), one exact-dup pair, one near-dup pair, one gate-fail doc
    def boilered(i: Int, id: Long) = {
      val t = five(i)._1 + "\n" + boiler
      (id, t, five(i)._2, five(i)._3, t.length.toLong)
    }
    val exactText = okA._1
    val nearBase = okB._1
    val crafted = Map(
      0 -> Seq(boilered(0, 100L), doc(200L, exactText, okA)),
      1 -> Seq(boilered(1, 1100L), doc(1200L, nearBase, okB),
        doc(1300L, okA._1 + " {x", okA)),
      2 -> Seq(boilered(2, 2100L), doc(2200L, exactText, okA)),
      3 -> Seq(boilered(3, 3100L), boilered(4, 3101L),
        doc(3200L, nearDupOf(nearBase), okB)))
    val fillerBatches = Seq(
      fillers.slice(0, 22), fillers.slice(22, 44),
      fillers.slice(44, 66), fillers.slice(66, 87))
    val batches = (0 to 3).map { b =>
      crafted(b) ++ fillerBatches(b).zipWithIndex.map { case (m, j) =>
        doc(b * 1000L + 10L + j, m._1, m)
      }
    }
    assert(batches.map(_.size).sum == 97)
    val corpus97 = df(batches.flatten: _*)

    // BATCH: the full pipeline in one pass (empty benchmark)
    val res = CurationPipeline.run(corpus97, corpus97.limit(0), lineMaxDocs = 3)
    val batchOut = res.curated.select("doc_id", "text", "n_chars")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    res.unpersist()

    // STREAM: the same corpus replayed in 4 id-ordered batches
    (0 to 3).foreach(b =>
      StreamingCuration.applyBatch(df(batches(b): _*), b.toLong, corpus, store))
    val streamOut = spark.read.parquet(s"$corpus/documents")
      .select("doc_id", "text", "n_chars")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    // MEMBERSHIP agrees exactly: exact-dup e' and near-dup m' dropped by
    // both (min-id survivor both sides), gate-fail dropped by both,
    // boiler carriers admitted by both
    assert(streamOut.keySet === batchOut.keySet)
    assert(!streamOut.keySet.exists(Set(1300L, 2200L, 3200L)),
      "later dup copies and the gate-fail doc admitted nowhere")
    assert(Set(100L, 1100L, 2100L, 3100L, 3101L, 200L, 1200L)
      .subsetOf(streamOut.keySet))

    // TEXTS agree everywhere except the named divergence: the boiler
    // line's df crossed lineMaxDocs=3 during batch 3, so 100/1100/2100
    // (admitted in batches 0-2) keep it in the stream and lose it in the
    // batch pipeline; 3100/3101 (the crossing batch) lose it in BOTH
    val divergent = Set(100L, 1100L, 2100L)
    for ((id, v) <- batchOut if !divergent(id))
      assert(streamOut(id) === v, s"doc $id must agree")
    val baseOf = Map(100L -> five(0)._1, 1100L -> five(1)._1,
      2100L -> five(2)._1)
    for (id <- divergent) {
      assert(batchOut(id) ===
        ((baseOf(id), baseOf(id).length.toLong)),
        s"batch removes the line from $id")
      assert(streamOut(id) ===
        ((baseOf(id) + "\n" + boiler, (baseOf(id) + "\n" + boiler).length.toLong)),
        s"stream keeps the line in early-admitted $id")
    }
  }
}
