package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The operators composed into the actual corpus-curation workflow — the
  * end-to-end shape a 100 TB training-data build runs, stage by stage:
  *
  *   normalize → signals (quality × language × repetition × Gopher ×
  *   C4, predicates = [[CurationGates]]) → line-grain boilerplate
  *   removal (CCNet, [[TextOps.lineDedup]]) → exact dedup →
  *   near-dedup (MinHash-LSH candidates → verified clusters) →
  *   decontaminate vs an eval set → split assignment → audit counts
  *
  * Each stage is one of the verified operators ([[TextOps]]); this module
  * only WIRES them, adding nothing semantic — so the composite inherits
  * every per-operator guarantee (determinism, blocked pair generation,
  * hash-only shuffles). Output: the curated corpus plus a per-stage audit
  * (the observability td_funnel provides for its own flag set).
  *
  * Scale notes: every stage is a narrow addition or an already-blocked
  * operator; the corpus is never collected, and the only whole-corpus
  * shuffles are the dedup groupings on 16-byte hashes. Stage order
  * matters and is the standard one — cheap row-local filters first so the
  * quadratic-ish dedup stages see the smallest corpus that still needs
  * them, decontamination last so it cannot resurrect near-dup survivors.
  */
object CurationPipeline {

  final case class Result(curated: DataFrame, audit: DataFrame,
                          cached: Seq[DataFrame] = Nil,
                          blocks: Seq[org.apache.spark.rdd.RDD[_]] = Nil) {
    /** Release the stage caches once `curated` has been written/consumed.
      * `blocks` holds EVERY RDD run() persisted (stage checkpoints AND
      * the operators' internal persists, captured by id-diffing the
      * context's persistent-RDD registry around the run — r13, VERDICT
      * r12 #7: Dataset.unpersist on a checkpointed frame is a no-op, so
      * the r12 form left the blocks to the best-effort ContextCleaner).
      * Releasing a local checkpoint makes its frame UNRECOMPUTABLE —
      * call only after `curated`/`audit` are consumed, per the
      * contract above. Unpersist is async (non-blocking) — storage
      * drains without stalling the caller. */
    def unpersist(): Unit = {
      cached.foreach(_.unpersist())
      blocks.foreach(_.unpersist(blocking = false))
    }
  }

  /** `exhaustivePairs = true` swaps the near-dedup candidate source from
    * banded LSH (the default: block count scales with data — 1.8× for
    * 10× rows in BENCH_SF1) to the exhaustive source-blocked pair search
    * (complete within blocks, but Σ|block|² with the corpus's fixed
    * source cardinality — a small-corpus/audit tool, not the 100 TB
    * default). `lineMaxDocs` is stage 1.5's CCNet boilerplate
    * threshold: a line appearing in more than this many distinct gated
    * documents is dropped from all of them. */
  def run(docs: DataFrame, benchmark: DataFrame,
          exhaustivePairs: Boolean = false, lineMaxDocs: Int = 3): Result = {
    val spark = docs.sparkSession
    import spark.implicits._
    // persistent-RDD registry snapshot: everything run() persists beyond
    // these ids (stage checkpoints + operator-internal persists) is
    // handed to Result.blocks for explicit release. run() is
    // driver-sequential within a session, so the diff is run()'s own.
    val preRun = spark.sparkContext.getPersistentRDDs.keySet

    // stage 1: normalize + row-local signals; keep docs that pass the
    // cheap gates before any pair work happens. The gate PREDICATES are
    // the shared [[CurationGates]] definitions — the same expressions
    // the registered funnel queries audit, so pipeline and
    // observability cannot drift (VERDICT r4 item 4). Gopher and C4
    // document-grain rules joined in alongside the original three
    // signals; all five are narrow row-local expressions, so the gate
    // stays scan-speed.
    // Every stage frame is localCheckpoint'd for the duration of run():
    // each is consumed at least twice (the next stage + its audit count,
    // and `exact` three times), so without the cut the audit counts
    // re-ran the full upstream DAG — the near-dup candidate generation
    // ~3× (ADVICE r2). The r1–r11 form used persist(), which caches the
    // DATA but keeps the full logical lineage: every downstream action
    // re-analyzed and re-optimized the whole accumulated DAG, and at
    // ~60 actions per pipeline run the driver paid seconds in planning
    // alone (r12, guide §5 — localCheckpoint cuts lineage; measured
    // 10.7 → 5.7 s on this operator, answers hash-identical). Blocks
    // release via the ContextCleaner once the frames go unreferenced;
    // Result.unpersist() stays for API compatibility.
    // r13 (VERDICT r12 #3, guide §1.5/§2.6): every audit count now RIDES
    // its stage's eager-checkpoint materialization as a Dataset.observe
    // metric instead of running as its own count() job afterwards — one
    // job per stage where the r12 shape paid job-per-audit (7 audit jobs
    // removed; checkpoint actions go through withAction, so the
    // observation listener fires — pinned by CheckpointObservationSpec).
    // Counts are computed over the identical frames, so the audit rows
    // are value-identical (oracle-checked).
    // per-gate rejection counts: one |gates|-column aggregation, each
    // count independent (a doc failing two gates appears in both rows —
    // the audit answers "what would this gate alone reject", which is
    // what threshold tuning needs). coalesce: sum() over an EMPTY corpus
    // is NULL, and the getLong below would NPE — an empty input must
    // yield a zero-count audit.
    val rejectCols = CurationGates.ordered.map { case (n, p) =>
      coalesce(sum(when(!p, 1L).otherwise(0L)), lit(0L)).as(n) }
    val rejectObs = org.apache.spark.sql.Observation()
    val signals = CurationGates.signalsOf(docs)
      .observe(rejectObs, rejectCols.head, rejectCols.tail: _*)
      .localCheckpoint()
    val gatedObs = org.apache.spark.sql.Observation()
    val gated = docs.join(signals, "doc_id")
      .filter(CurationGates.all)
      .select(docs.columns.map(col): _*)
      .observe(gatedObs, count(lit(1)).as("n"))
      .localCheckpoint()
    val rejects = rejectObs.get

    // stage 1.5: line-grain cross-doc boilerplate removal (the CCNet
    // step, [[TextOps.lineDedup]]) — BEFORE exact dedup, because shared
    // boilerplate both masks real duplicates (two copies of a page
    // differing only in nav chrome hash apart) and manufactures false
    // ones (two unrelated pages that are mostly shared template hash
    // together once the unique tail is short). Heavy lines are counted
    // within the GATED corpus (the stage's actual input). The funnel
    // row counts TOUCHED docs; a doc whose EVERY line was boilerplate
    // (no kept lines) is dropped — an empty rewrite must not ride into
    // the curated corpus past gates that never saw the empty text.
    // Text-derived columns are recomputed from the rewritten text
    // (n_chars here — the only derived doc column in this schema), so
    // downstream measures never mix pre-rewrite stats with post-rewrite
    // text.
    val nGated = gatedObs.get("n").asInstanceOf[Long]
    val lineObs = org.apache.spark.sql.Observation()
    val lineDeduped = TextOps.applyLineRemoval(gated,
        TextOps.lineHashCounts(gated)
          .filter(col("n_docs") > lineMaxDocs).select("h"))
      .observe(lineObs, count(lit(1)).as("n"),
        coalesce(sum(when(col("n_removed") > 0, 1L).otherwise(0L)), lit(0L))
          .as("touched"))
      .localCheckpoint()
    val nLineTouched = lineObs.get("touched").asInstanceOf[Long]
    val nDroppedEmpty = nGated - lineObs.get("n").asInstanceOf[Long]
    val cleaned = lineDeduped.select(docs.columns.map(col): _*)

    // stage 2: exact dedup — canonical doc per content hash
    val exactObs = org.apache.spark.sql.Observation()
    val exact = cleaned
      .withColumn("h", md5(TextOps.normalized(col("text"))))
      .withColumn("canonical",
        min("doc_id").over(org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .filter(col("doc_id") === col("canonical"))
      .drop("h", "canonical")
      .observe(exactObs, count(lit(1)).as("n"))
      .localCheckpoint()

    // stage 3: near-dedup — LSH candidates verified by Jaccard, resolved
    // to clusters, keep each cluster's canonical member
    val pairs =
      if (exhaustivePairs) TextOps.nearDupPairs(exact)
      else TextOps.lshCandidatePairs(exact).filter(col("jaccard") >= 0.5)
    val clusters = TextOps.dedupClusters(pairs)
    val nearObs = org.apache.spark.sql.Observation()
    val nearDeduped = exact.join(
      clusters.filter(col("doc_id") =!= col("canonical_id")).select("doc_id"),
      Seq("doc_id"), "left_anti")
      .observe(nearObs, count(lit(1)).as("n"))
      .localCheckpoint()

    // stage 4: decontaminate against the benchmark slice — size-adaptive:
    // broadcast-set path for eval-sized benchmarks, Bloom prefilter when
    // the benchmark outgrows the broadcast threshold (same answer)
    val curObs = org.apache.spark.sql.Observation()
    val curated = TextOps.decontaminateAuto(nearDeduped, benchmark)
      .observe(curObs, count(lit(1)).as("n"))
      .localCheckpoint()

    // stage 5: deterministic split assignment rides along
    val withSplit = curated.select(
      col("*") +: Seq(TextOps.assignSplit().as("split")): _*)

    // audit counts in stage order — all already collected by the stage
    // materializations above (observe metrics), no count jobs here.
    // docs.count() is a zero-column parquet metadata scan.
    val audit = (Seq(
      ("0_input", docs.count()),
      ("1_gated", nGated)) ++
      CurationGates.ordered.map { case (n, _) =>
        (s"1_reject_$n", rejects(n).asInstanceOf[Long]) } ++ Seq(
      // line dedup mostly rewrites — 'touched' counts documents that
      // LOST at least one boilerplate line; 'dropped_empty' counts the
      // documents it DROPPED outright (every line boilerplate), so the
      // funnel reconciles: 2_exact_dedup starts from 1_gated −
      // dropped_empty, and empty-rewrite losses are never misread as
      // exact-dedup losses
      ("1z_line_dedup_touched", nLineTouched),
      ("1z_line_dedup_dropped_empty", nDroppedEmpty),
      ("2_exact_dedup", exactObs.get("n").asInstanceOf[Long]),
      ("3_near_dedup", nearObs.get("n").asInstanceOf[Long]),
      ("4_decontaminated", curObs.get("n").asInstanceOf[Long])))
      .toDF("stage", "n_docs")
    Result(withSplit, audit,
      cached = Seq(signals, gated, lineDeduped, exact, nearDeduped, curated),
      blocks = spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => preRun.contains(id) }.values.toSeq)
  }
}
