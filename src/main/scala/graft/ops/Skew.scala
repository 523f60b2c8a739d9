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
}
