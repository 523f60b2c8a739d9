package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for heavy-hitter join keys.
  *
  * AQE's skew-join handling splits oversized sort-merge partitions at
  * runtime, which covers most cases for free. The manual salt is still the
  * right tool when (a) the join is hash-partitioned by an upstream
  * repartition that AQE won't touch, or (b) one logical key is so hot that
  * even a split partition overwhelms a single task's build side. This is
  * the classic transform: spread the hot key over `saltFactor` reducers by
  * appending a salt to the big side's key, replicating the small side once
  * per salt value.
  */
object Skew {

  /** Inner equi-join `big ⋈ small` on `keys`, salted. Result is row-for-row
    * identical to the plain join; only the shuffle distribution changes.
    * The salt is a deterministic hash of the big side's whole row, so a
    * single hot key spreads evenly and reruns place rows identically
    * (no rand(): nondeterminism breaks task retry semantics). The small
    * side is replicated `saltFactor`× via explode — its shuffle volume
    * multiplies, which is the explicit price of de-skewing the big side. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }


  /** Key-skew diagnostic — the pre-flight check that decides between a
    * plain join, [[saltedJoin]], and AQE skew handling BEFORE a 100 TB
    * shuffle is committed: the `topN` heaviest keys with each key's
    * share of total rows and the running cumulative share. A top key at
    * 30% share means one task gets 30% of the shuffle — salt it; a flat
    * top-N means the key is safe. One aggregation on the key plus a
    * window over `topN` rows (WindowGroupLimit keeps per-task state at
    * topN); output is topN rows regardless of corpus size.
    * Multi-column keys report as a '|'-joined string. */
  def skewReport(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
                 topN: Int = 10): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .select(concat_ws("|", keys.map(k => col(k).cast("string")): _*).as("key"),
        col("cnt"))
      // the key-grain counts feed BOTH the top-N chain and the totals
      // aggregate; without a checkpoint the full input scans twice
      // (measured: no ReusedExchange fires across the two consumers)
      .localCheckpoint()
    val total = counts.agg(sum("cnt").as("total_rows"),
      count(lit(1)).as("n_keys"))
    val w = Window.orderBy(col("cnt").desc, col("key").asc)
    counts
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topN)
      .crossJoin(broadcast(total))
      .withColumn("share",
        round(col("cnt").cast("double") / col("total_rows"), 6))
      .withColumn("cum_share",
        round(sum(col("cnt")).over(
          Window.orderBy(col("rk"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double") / col("total_rows"), 6))
      .select("rk", "key", "cnt", "n_keys", "share", "cum_share")
  }
}
