package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming maintenance of the KMV distinct sketch.
  *
  * CMS and linear counting stream through [[AggSink]] because their state
  * is a per-KEY algebraic aggregate (cell counts / presence). KMV's state
  * is different in kind: a bounded ORDER STATISTIC (the k smallest hashes
  * per group), so the mart pattern would have to persist every distinct
  * hash — cardinality-sized state, exactly what the sketch exists to
  * avoid. The right Spark shape is `mapGroupsWithState`: per group, fold
  * each micro-batch's hashes into the retained k-min list (merge, dedup,
  * sort, truncate — the SAME union-merge [[graft.text.TextOps
  * .kmvPairJaccard]] uses across groups, here applied across TIME). State
  * per group is k longs, bounded forever; each batch emits the group's
  * refreshed sketch row.
  *
  * At 100 TB-scale ingest this is the cheap continuous cardinality
  * monitor: k·|groups| longs of state stands in for a distinct-count over
  * the full stream history, and the emitted (k-th min, estimate) pair
  * feeds the same estimator the batch side oracles
  * (`td_kmv_distinct`).
  */
object SketchStreams {

  /** Range of [[graft.text.TextOps.md5Long]]: [0, 2^60). */
  private val KmvRange = (1L << 60).toDouble

  /** `hashed` carries (grp: String, h: Long) — the pre-hashed item
    * stream (hash with md5Long upstream so the sketch is engine- and
    * replay-deterministic). Emits one row per touched group per batch:
    * (grp, n_kept, u_k, kmv_estimate) where the estimate is (k−1)/u_k,
    * or n_kept itself while fewer than k distinct hashes were seen —
    * identical arithmetic to the batch `TextOps.kmvDistinct`. */
  def kmvStream(hashed: DataFrame, k: Int): Dataset[KmvSketchRow] = {
    import hashed.sparkSession.implicits._
    hashed.select(col("grp").cast("string"), col("h").cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Long], KmvSketchRow](
        GroupStateTimeout.NoTimeout) { case (grp, rows, state) =>
        val prior = state.getOption.getOrElse(Array.empty[Long])
        // merge = union, dedup, sort, truncate — the KMV union-merge;
        // bounded at k + batch size in flight, k retained
        val merged = (prior ++ rows.map(_._2)).distinct.sorted.take(k)
        state.update(merged)
        val n = merged.length
        val est =
          if (n < k) n.toDouble
          else (k - 1).toDouble * KmvRange / merged.last.toDouble
        KmvSketchRow(grp, n.toLong,
          BigDecimal(merged.last.toDouble / KmvRange)
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(est).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
      }
  }

  /** Start the stream into an in-memory sink (tests / monitoring). */
  def run(hashed: DataFrame, k: Int, queryName: String) =
    kmvStream(hashed, k).writeStream
      .outputMode(OutputMode.Update)
      .format("memory")
      .queryName(queryName)
      .start()
}

case class KmvSketchRow(grp: String, n_kept: Long, u_k: Double,
                        kmv_estimate: Double)
