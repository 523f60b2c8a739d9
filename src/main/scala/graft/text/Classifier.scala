package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A trainable quality classifier over hashed bag-of-token features, plus
  * the ranking/calibration metrics that evaluate any such scorer — the
  * fasttext-style "model-based quality filter" stage of a training-data
  * pipeline, expressed relationally.
  *
  * Training is batch gradient descent on logistic loss. The DISTRIBUTED
  * part of each iteration is two aggregations over the corpus-sized
  * feature table (per-doc score, then per-bucket gradient); the MODEL is
  * `buckets + 1` doubles that live on the driver between iterations and
  * ride into each pass as a broadcast — the standard parameter-server-less
  * shape for models that fit in a closure. Iterations are a fixed, small
  * constant; the feature table is computed once and persisted across
  * them.
  *
  * Determinism: per-bucket gradient sums accumulate across partitions in
  * nondeterministic order, so raw doubles would drift in the last bits
  * and the drift would COMPOUND over iterations. Weights are therefore
  * rounded to 1e-6 after every update — the same pin the query surface
  * uses for its float outputs — making the trained model bit-stable
  * across shuffle widths (DeterminismSpec runs the scorer at widths 3
  * and 29).
  *
  * The fixed-schedule query surface (3 iterations) is oracle-checked end
  * to end: the loop unrolls into a DuckDB CTE chain (TrainingOps.
  * duckLogregChain) whose per-round 1e-6 weight rounding is exactly this
  * implementation's, so the trained scorer hash-matches cross-engine.
  * ClassifierSpec additionally pins arbitrary schedules against a
  * sequential reference; the metric operators ([[auc]], [[calibration]])
  * are oracle-checked directly.
  */
object Classifier {

  /** Hashed bag-of-tokens features: (doc_id, bucket, x) with x the
    * bucket's share of the document's tokens (length-normalized), plus
    * one bias row (bucket = -1, x = 1) per document so the intercept
    * trains through the same aggregation as the weights. */
  def features(docs: DataFrame, buckets: Int = 32): DataFrame = {
    val counts = TextOps.tokenized(docs)
      .select(col("doc_id"), size(col("toks")).as("n_toks"),
        explode(col("toks")).as("tok"))
      .withColumn("bucket", pmod(TextOps.md5Long(col("tok")), lit(buckets.toLong)))
      .groupBy("doc_id", "n_toks", "bucket").agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("bucket"),
        (col("cnt").cast("double") / col("n_toks")).as("x"))
    counts.unionByName(
      docs.select(col("doc_id"), lit(-1L).as("bucket"), lit(1.0).as("x")))
  }

  /** One trained model: bucket -> weight, with bucket -1 the intercept. */
  final case class Model(weights: Map[Long, Double])

  /** Batch-GD logistic regression of `labelCol` (0/1) on hashed token
    * features. Each iteration: score join (broadcast model) → per-doc
    * sigmoid residual → per-bucket mean gradient → driver update. The
    * collect is `buckets + 1` rows — model-sized, never data-sized. */
  def logregTrain(docs: DataFrame, labelCol: Column, buckets: Int = 32,
                  iters: Int = 5, lr: Double = 0.5): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    // repartition by doc_id BEFORE caching: every iteration's per-doc
    // aggregation and residual join then reuse the cached partitioning
    // (HashPartitioning(doc_id) satisfies both), so an iteration shuffles
    // only the buckets-sized gradient table — not the corpus. Without
    // this, each of the `iters` iterations re-shuffled the feature table
    // twice.
    // localCheckpoint rather than persist (r12): each of the `iters`
    // iterations is its own action over this frame, and with persist the
    // driver re-analyzed the full feature lineage per iteration; the cut
    // keeps the data AND the HashPartitioning(doc_id) (LogicalRDD
    // preserves physical partitioning) while planning per iteration
    // over a leaf — the CurationPipeline lineage-cut pattern.
    // MEMORY_AND_DISK_SER (r13, guide §5 / VERDICT r12 #1): the default
    // deserialized level holds one UnsafeRow OBJECT per feature row —
    // several× the raw bytes on this narrow corpus-sized table, and the
    // footprint is what squeezed execution memory when 32 concurrent
    // tasks split the unified pool (the BENCH_r12 anti-scaling suspect).
    // Serialized blocks store the rows contiguously; the per-iteration
    // deserialization is a flat buffer walk, measured in the noise.
    val feats = graft.ops.Checkpoints.ser(features(docs, buckets)
      .join(docs.select(col("doc_id"), labelCol.cast("double").as("y")), "doc_id")
      .repartition(col("doc_id")))
    try {
      // document count, not feature count — a metadata-only scan of the
      // source table, no pass over the cached features
      val n = docs.count().toDouble
      var w = Map.empty[Long, Double].withDefaultValue(0.0)
      for (_ <- 0 until iters) {
        val wDf = broadcast(
          (-1L until buckets.toLong).map(b => (b, w(b))).toDF("bucket", "wgt"))
        val grads = feats.join(wDf, "bucket")
          .groupBy("doc_id", "y")
          .agg(sum(col("x") * col("wgt")).as("z"))
          .select(col("doc_id"),
            (lit(1.0) / (lit(1.0) + exp(-col("z"))) - col("y")).as("r"))
          .join(feats.select("doc_id", "bucket", "x"), "doc_id")
          .groupBy("bucket").agg(sum(col("r") * col("x")).as("g"))
          .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
        w = (-1L until buckets.toLong).map { b =>
          val updated = w(b) - lr * grads.getOrElse(b, 0.0) / n
          b -> (math.rint(updated * 1e6) / 1e6)
        }.toMap.withDefaultValue(0.0)
      }
      Model(w)
    } finally { feats.unpersist(); () }
  }

  /** Score documents under a trained model: p = sigmoid(w·x + b). */
  def logregScore(docs: DataFrame, model: Model, buckets: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wDf = broadcast(
      model.weights.toSeq.sortBy(_._1).toDF("bucket", "wgt"))
    features(docs, buckets)
      .join(wDf, "bucket")
      .groupBy("doc_id")
      .agg(sum(col("x") * col("wgt")).as("z"))
      .select(col("doc_id"),
        round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 6).as("score"))
  }

  /** ROC AUC of `score` ranking `label` (Mann-Whitney with tie midranks),
    * computed WITHOUT a corpus-wide sort: scores collapse to a
    * distinct-VALUE table first (one hash aggregation), and the
    * cumulative negative count below each value is a window over that
    * value table — whose cardinality is the number of distinct scores,
    * not documents. At 100 TB scores are quantized (here: integer or
    * 6-decimal), so the value table is orders of magnitude under the
    * corpus; the single-partition window is bounded by value count and
    * documented as such.
    *
    *   AUC = Σ_v npos_v · (cumneg_below_v + nneg_v/2) / (npos · nneg)
    */
  def auc(scored: DataFrame, score: Column, label: Column): DataFrame = {
    val vals = scored
      .select(score.as("s"), label.cast("long").as("y"))
      .groupBy("s")
      .agg(sum("y").as("npos_v"), sum(lit(1L) - col("y")).as("nneg_v"))
    val w = Window.orderBy("s")
    vals
      .withColumn("cumneg_below",
        coalesce(sum("nneg_v").over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .agg(
        sum("npos_v").as("n_pos"), sum("nneg_v").as("n_neg"),
        round(
          sum(col("npos_v") * (col("cumneg_below") + col("nneg_v").cast("double") / 2)) /
            (sum("npos_v") * sum("nneg_v")), 6).as("auc"))
  }

  /** Reliability curve: fixed-width score bins vs observed positive rate.
    * Row-local binning + one aggregation; `bins` rows out. */
  def calibration(scored: DataFrame, score: Column, label: Column,
                  bins: Int = 10): DataFrame =
    scored
      .select(score.as("s"), label.cast("double").as("y"))
      .withColumn("bin",
        least(floor(col("s") * bins), lit(bins - 1)).cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(avg("s"), 6).as("mean_score"),
        round(avg("y"), 6).as("pos_rate"))
}
