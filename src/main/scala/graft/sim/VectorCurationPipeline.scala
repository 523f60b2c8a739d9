package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The vector-side composed curation pipeline — the embedding-family
  * sibling of [[graft.text.CurationPipeline]] (VERDICT r9 #5): every
  * member operator was already verified in isolation (`emb_semdedup`,
  * `emb_decontaminate`, exact dedup, `td_split`); this module verifies
  * their COMPOSITION, stage by stage, the way a training-data build
  * actually runs them:
  *
  *   exact dedup (identical embeddings collapse to the min-id member) →
  *   SemDeDup keep/drop ([[Embeddings.semDedup]], derived k-means
  *   cells) → semantic decontamination vs an eval set
  *   ([[Embeddings.semanticDecontaminate]]) → deterministic split
  *   assignment → per-stage audit counts
  *
  * Like the text pipeline, this module only WIRES verified operators,
  * adding nothing semantic — the composite inherits each stage's
  * guarantees (determinism, cell-blocked pair generation, broadcast
  * eval side). Stage order is the standard one: exact dedup first
  * (identical vectors would otherwise consume SemDeDup pair work and
  * could mask each other's near-duplicates), decontamination after
  * dedup so it cannot resurrect dropped members, split last so
  * assignment sees exactly the released corpus.
  *
  * Scale notes: the only whole-corpus shuffles are the exact-dedup
  * grouping (on the embedding bytes — at 100 TB this would group on a
  * 16-byte content hash instead, same plan shape) and semDedup's
  * cell-blocked rank/pair pass (Σ|cell|², the registered bucketed plan
  * past the cell floor); the eval side broadcasts. Nothing collects but
  * the audit counts.
  *
  * Survivor policy vs the STREAMING face: batch SemDeDup keeps each
  * cell-duplicate-group's least centroid-typical member;
  * [[graft.streaming.SemDedupIngest]] keeps the earliest arrival. Same
  * duplicate RELATION, different canonical pick — an intentional policy
  * difference, spec-asserted by name in VectorCurationPipelineSpec
  * rather than papered over. */
object VectorCurationPipeline {

  final case class Result(curated: DataFrame, audit: DataFrame,
                          cached: Seq[DataFrame] = Nil,
                          blocks: Seq[org.apache.spark.rdd.RDD[_]] = Nil) {
    /** Release the stage caches once `curated` has been consumed.
      * Stage frames are localCheckpoint'd (r12 — lineage cut, see
      * [[graft.text.CurationPipeline]]'s stage-cache note; same
      * measured driver-side planning win). `blocks` holds every RDD
      * run() persisted (r13 — registry id-diff; Dataset.unpersist on a
      * checkpointed frame is a no-op), so release is now EXPLICIT, not
      * ContextCleaner-best-effort. After unpersist the checkpointed
      * frames are unrecomputable — consume `curated`/`audit` first. */
    def unpersist(): Unit = {
      cached.foreach(_.unpersist())
      blocks.foreach(_.unpersist(blocking = false))
    }
  }

  /** `evalFilter` splits the input: matching rows are the eval set
    * (never released, used only to decontaminate), the rest is the
    * corpus. `nCells = 0` derives the SemDeDup cell count from the
    * corpus size ([[graft.ops.ScaleKnobs.kmeansCells]] at `cellsFloor`,
    * the `emb_semdedup` contract — the floor resolves at every oracle
    * sf, which is what the static oracle SQL assumes); pass `nCells > 0`
    * to pin it, or `labelCells = true` to use the input's `label`
    * column as the cell (the pre-clustered case — e.g. a persisted IVF
    * index's cells, [[Embeddings.semDedup]]'s own `nCells = 0`
    * contract; this is the blocking [[graft.streaming.SemDedupIngest]]
    * uses, which is what makes the batch/stream parity spec possible). */
  def run(embeddings: DataFrame, evalFilter: Column,
          semThreshold: Double = 0.4, nCells: Int = 0, cellsFloor: Int = 16,
          decontThreshold: Double = 0.4, labelCells: Boolean = false): Result = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // registry snapshot for Result.blocks (see text CurationPipeline)
    val preRun = spark.sparkContext.getPersistentRDDs.keySet

    val carried =
      if (labelCells) Seq(col("vec_id"), col("embedding"), col("label"))
      else Seq(col("vec_id"), col("embedding"))
    // r13 (VERDICT r12 #3, guide §1.5): stage counts ride the eager
    // checkpoint materializations as observe metrics — no count() job
    // per audit row (the td CurationPipeline fusion, same mechanism,
    // pinned by CheckpointObservationSpec).
    val inObs = org.apache.spark.sql.Observation()
    val corpus = embeddings.filter(!evalFilter).select(carried: _*)
      .observe(inObs, count(lit(1)).as("n")).localCheckpoint()
    val evalSet = embeddings.filter(evalFilter)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val nInput = inObs.get("n").asInstanceOf[Long]

    // stage 1: exact dedup — byte-identical embeddings collapse to the
    // min-vec_id member (the text pipeline's content-hash canonical,
    // with the raw vector standing in for the hash at this width)
    val exObs = org.apache.spark.sql.Observation()
    val exact = corpus
      .withColumn("cvid", min("vec_id").over(Window.partitionBy("embedding")))
      .filter(col("vec_id") === col("cvid")).drop("cvid")
      .observe(exObs, count(lit(1)).as("n"))
      .localCheckpoint()
    val nExact = exObs.get("n").asInstanceOf[Long]

    // stage 2: SemDeDup keep/drop over derived k-means cells (or the
    // carried label cells) — the registered emb_semdedup operator on
    // the deduped corpus. Cells derive from nExact, the DEDUPED count
    // (ADVICE r10): the exact-dedup stage feeds SemDeDup, so its size
    // is the operator-contract input — deriving from nInput would
    // over-provision cells on multiplicity-heavy corpora relative to
    // the standalone emb_semdedup this stage claims to merely wire.
    // Oracle-neutral: every oracle sf resolves both counts to the floor.
    val cells =
      if (labelCells) 0
      else if (nCells > 0) nCells
      else graft.ops.ScaleKnobs.kmeansCells(nExact, floor = cellsFloor)
    val marked = Embeddings.semDedup(exact, threshold = semThreshold,
      nCells = cells,
      nCoarse = if (cells > 0) graft.ops.ScaleKnobs.kmeansCoarse(cells) else 1,
      nCoarse2 = if (cells > 0) graft.ops.ScaleKnobs.kmeansCoarse2(cells) else 1)
    val semObs = org.apache.spark.sql.Observation()
    val survivors = exact.join(
      marked.filter(col("is_dup") === 1).select("vec_id"),
      Seq("vec_id"), "left_anti")
      .observe(semObs, count(lit(1)).as("n")).localCheckpoint()
    val nSem = semObs.get("n").asInstanceOf[Long]

    // stage 3: semantic decontamination of the survivors vs the eval
    // set — flagged rows drop (the audit column records what matched
    // in the standalone operator; the pipeline applies the filter)
    val flagged = Embeddings.semanticDecontaminate(
      survivors.select(col("vec_id"), col("embedding")).unionByName(evalSet),
      evalFilter, threshold = decontThreshold)
    val decObs = org.apache.spark.sql.Observation()
    val curated = survivors.join(
      flagged.filter(col("contaminated") === 1).select("vec_id"),
      Seq("vec_id"), "left_anti")
      .observe(decObs, count(lit(1)).as("n")).localCheckpoint()
    val nDecon = decObs.get("n").asInstanceOf[Long]

    // stage 4: deterministic split assignment rides along (same salt
    // and buckets as the text side, keyed on vec_id)
    val withSplit = curated.withColumn("split",
      graft.text.TextOps.assignSplit(id = col("vec_id")))
    val splitRows = withSplit.groupBy("split").agg(count(lit(1)).as("n"))
      .collect().map(r => (s"4_split_${r.getString(0)}", r.getLong(1))).toSeq

    val audit = (Seq(
      ("0_input", nInput),
      ("1_exact_dedup", nExact),
      ("2_semdedup", nSem),
      ("3_decontaminated", nDecon)) ++ splitRows.sortBy(_._1))
      .toDF("stage", "n_vecs")
    Result(withSplit, audit,
      cached = Seq(corpus, evalSet, exact, survivors, curated),
      blocks = spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => preRun.contains(id) }.values.toSeq)
  }
}
