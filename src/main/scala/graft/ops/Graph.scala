package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms as DataFrame plans (Pregel-as-SQL).
  *
  * The reference has no graph operator; this extends the training-data
  * surface with the standard link-analysis primitive a web-scale corpus
  * pipeline uses for source/domain authority weighting (quality-weighted
  * mixture sampling takes any per-source score — PageRank over the
  * citation/link graph is the classic one).
  *
  * Scale design (the 100 TB stance): per round there is exactly ONE
  * shuffle — the edge list keyed by `dst` aggregating incoming
  * `rank/deg` contributions — and the rank frame carried between rounds
  * is two narrow columns, localCheckpoint'd so lineage depth stays
  * constant (same iterative-plan discipline as
  * [[graft.sim.Embeddings.kmeansTrain]] and
  * [[graft.text.TextOps.bpeTrain]]). Degrees are precomputed once;
  * nothing ever windows over the node set and the driver sees no
  * per-round data. On a 1000-executor cluster the edge list can be
  * pre-partitioned by `src` so the contribution join is co-located and
  * only the dst-keyed aggregation moves bytes.
  */
object Graph {

  /** PageRank over a directed edge list (`src`, `dst` long columns).
    * Every node must appear as a `src` at least once (true for
    * undirected graphs fed as both directions; for directed graphs with
    * sinks, add self-loops or symmetrize first — dangling mass is NOT
    * redistributed here). Returns (node, deg, n_nodes, rank) with ranks
    * summing to ~1. Deterministic given deterministic input: the only
    * float reduction is the per-dst contribution sum, whose 1e-16-scale
    * order sensitivity vanishes under the caller's output rounding.
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = deg.select(col("src").as("node"), col("deg"))
    val n = nodes.agg(count(lit(1)).as("n_nodes"))
    var rank = nodes.crossJoin(broadcast(n))
      .select(col("node"), col("deg"), col("n_nodes"),
        (lit(1.0) / col("n_nodes")).as("rank"))
    // rank/contrib are |nodes|-sized — ORDERS smaller than the edge
    // table. Size-gate them onto the broadcast side (r12, guide §3.1):
    // when they fit, an iteration never shuffles edges (one map-side-
    // combined groupBy(dst) is the only exchange, down from three); when
    // the node table outgrows the threshold the gate declines and the
    // historical shuffle plan runs unchanged. Row-identical either way.
    val gate = graft.ops.AutoBroadcast.decideFrom(nodes, 2.0)
    def bSide(df: DataFrame) = if (gate) broadcast(df) else df
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(bSide(rank.withColumnRenamed("node", "src")), "src")
        .groupBy("dst").agg(sum(col("rank") / col("deg")).as("in_rank"))
      rank = rank.drop("rank")
        .join(bSide(contrib.withColumnRenamed("dst", "node")), Seq("node"), "left")
        .select(col("node"), col("deg"), col("n_nodes"),
          ((lit(1.0) - damping) / col("n_nodes") +
            lit(damping) * coalesce(col("in_rank"), lit(0.0))).as("rank"))
        .localCheckpoint()
    }
    rank
  }
}
