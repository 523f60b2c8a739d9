package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-earlier) join — an operator Spark lacks natively.
  *
  * For each left row, attach the latest right row whose timestamp is <=
  * the left row's, within the same key group (classic telemetry/market-data
  * enrichment). Implemented by composition, per the custom-operator
  * preference ladder: tag both sides, union them, and carry the right
  * side's values forward with `last(_, ignoreNulls)` over a key-partitioned
  * window ordered by (ts, side) — right rows sort before left rows at equal
  * timestamps, so ties match (left.ts >= right.ts).
  *
  * Scale shape: ONE shuffle (hash on the key) + one per-partition sort —
  * the naive range-join formulation explodes to |left|×|right| pairs per
  * key before filtering, which the planner must never see. Skewed keys
  * fall to [[joinAsOfSalted]]: per-(key, time-range) windows with a
  * cross-bucket boundary carry, identical answers.
  *
  * Requirements: non-key column names must be disjoint between the sides
  * (rename before calling); if several right rows share (key, ts), which
  * one wins is unspecified — pre-dedup the right side for determinism.
  */
object AsOf {

  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String): DataFrame = {
    val carryCols = right.columns.filterNot(keys.contains).toSeq
    val leftCols = left.columns.toSeq

    val taggedLeft = carryCols.foldLeft(
      left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))) {
      (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val taggedRight = leftCols.filterNot(keys.contains).foldLeft(
      right.withColumn("__ts", col(rightTs)).withColumn("__side", lit(0))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    carryCols.foldLeft(taggedLeft.unionByName(taggedRight)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
      .filter(col("__side") === 1)
      .drop("__ts", "__side")
      .select((leftCols ++ carryCols).map(col): _*)
  }

  /** Forward as-of: attach the EARLIEST right row with ts >= the left
    * row's (pandas merge_asof direction='forward'), optionally bounded by
    * `toleranceSec` — a match farther than the tolerance is nulled, which
    * is the semantics telemetry wants for "next error after this click,
    * if within the hour". Same one-shuffle composition as [[joinAsOf]],
    * mirrored: `first(_, ignoreNulls)` over [current, +∞) with left rows
    * sorting BEFORE right rows at equal timestamps so ties match. The
    * right timestamp rides along as a carried column for the tolerance
    * mask (and is dropped again). Pre-dedup the right side on (keys, ts)
    * for a deterministic winner. */
  def joinAsOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      toleranceSec: Option[Long] = None): DataFrame = {
    val carryCols = right.columns.filterNot(keys.contains).toSeq
    val leftCols = left.columns.toSeq
    val rightPlus = right.withColumn("__rts", col(rightTs))
    val carry = carryCols :+ "__rts"

    val taggedLeft = carry.foldLeft(
      left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(0))) {
      (df, c) =>
        val dt = if (c == "__rts") right.schema(rightTs).dataType
                 else right.schema(c).dataType
        df.withColumn(c, lit(null).cast(dt))
    }
    val taggedRight = leftCols.filterNot(keys.contains).foldLeft(
      rightPlus.withColumn("__ts", col(rightTs)).withColumn("__side", lit(1))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val carried = carry.foldLeft(taggedLeft.unionByName(taggedRight)) {
      (df, c) => df.withColumn(c, first(col(c), ignoreNulls = true).over(w))
    }.filter(col("__side") === 0)

    val masked = toleranceSec match {
      case Some(tol) =>
        // exact microsecond compare: a seconds-truncating diff admits
        // matches up to a second beyond the tolerance at the boundary.
        // The family works on any ordered ts; for NUMERIC timestamps the
        // tolerance is in the column's own units (raw subtraction —
        // unix_micros would fail analysis), for real timestamps in
        // seconds as the name says (ADVICE r4).
        val within = right.schema(rightTs).dataType match {
          case _: org.apache.spark.sql.types.NumericType =>
            col("__rts") - col("__ts") <= tol
          case _ =>
            unix_micros(col("__rts")) - unix_micros(col("__ts")) <=
              tol * 1000000L
        }
        val ok = col("__rts").isNotNull && within
        carryCols.foldLeft(carried.withColumn("__ok", ok)) {
          (df, c) => df.withColumn(c, when(col("__ok"), col(c)))
        }.drop("__ok")
      case None => carried
    }
    masked.drop("__ts", "__side", "__rts")
      .select((leftCols ++ carryCols).map(col): _*)
  }

  /** Skew-hardened as-of: identical semantics to [[joinAsOf]], but the
    * per-key window is SUB-PARTITIONED by time range so a hot key (one
    * device emitting 99% of the telemetry) never lands in a single task.
    *
    * Mechanism — range bucketing with cross-bucket boundary carry:
    *  1. rows bucket by `floor((ts − min)/width)` over `buckets` equal
    *     time ranges (global min/max: one aggregate, two driver
    *     scalars). Equal timestamps share a bucket, so bucket order is
    *     ts order and the per-(key, bucket) window preserves as-of
    *     semantics WITHIN its range.
    *  2. a left row whose latest right predecessor lives in an EARLIER
    *     bucket needs carry-in: per (key, bucket), each carry COLUMN
    *     reduces to its last non-null right value (per-column, matching
    *     joinAsOf's last-non-null carry — a null in the newest right row
    *     must not mask an earlier non-null), and a second window over
    *     the |keys|×|buckets|-row bucket spine (previous buckets only)
    *     yields each bucket's carry-in per column.
    *  3. in-bucket matches win (their ts is ≥ the bucket start, hence ≥
    *     any earlier bucket's rows); the carry-in fills only windows
    *     with no in-bucket predecessor — a per-row coalesce.
    *
    * Scale: the big-side shuffle is hash(keys, bucket) — hot-key
    * parallelism × `buckets`, the knob to grow with the hot key's row
    * count. The spine frame is bucket-grain (tiny), its window cheap,
    * and the carry-in join broadcasts. Ties at equal ts match exactly as
    * [[joinAsOf]] (side ordering inside each bucket). Pre-dedup the
    * right side on (keys, ts) for a deterministic winner. */
  def joinAsOfSalted(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String,
                     buckets: Int = 32): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val carryCols = right.columns.filterNot(keys.contains).toSeq
    val leftCols = left.columns.toSeq

    val taggedLeft = carryCols.foldLeft(
      left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))) {
      (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val taggedRight = leftCols.filterNot(keys.contains).foldLeft(
      right.withColumn("__ts", col(rightTs)).withColumn("__side", lit(0))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = taggedLeft.unionByName(taggedRight)

    // numeric image of the ts for range arithmetic (ordering-preserving)
    val tsn = right.schema(rightTs).dataType match {
      case _: org.apache.spark.sql.types.NumericType =>
        col("__ts").cast("double")
      case _ => unix_micros(col("__ts")).cast("double")
    }
    val withTsn = unioned.withColumn("__tsn", tsn)
    // bucket bounds: ONE aggregate, two driver scalars — the same
    // bounded-driver-traffic posture as the BPE argmax
    val bounds = withTsn.agg(min("__tsn"), max("__tsn")).collect()(0)
    val (mn, mx) =
      if (bounds.isNullAt(0)) (0.0, 0.0)
      else (bounds.getDouble(0), bounds.getDouble(1))
    val width = math.max((mx - mn) / buckets, java.lang.Double.MIN_VALUE)
    val withB = withTsn.withColumn("__b",
      least(greatest(floor((col("__tsn") - mn) / width), lit(0)),
        lit(buckets - 1)).cast("int"))

    // per-(key, bucket) as-of carry — the hot key now spreads over
    // `buckets` tasks
    val w = Window.partitionBy((keys :+ "__b").map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = carryCols.foldLeft(withB) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }

    // bucket spine: each (key, bucket) reduced PER CARRY COLUMN to its
    // last NON-NULL right value (joinAsOf's last(_, ignoreNulls) is a
    // per-column carry, so a null in the latest right row must not mask
    // an earlier non-null — a row-grain spine would diverge exactly
    // there); then carry-in = last non-null per column over PREVIOUS
    // buckets. Ties at equal ts take the larger value — inside the
    // "pre-dedup the right side for a deterministic winner" contract.
    val spine = withB
      .groupBy((keys :+ "__b").map(col): _*)
      .agg(
        max(when(col("__side") === 0 && col(carryCols.head).isNotNull,
          struct(col("__ts").as("t"), col(carryCols.head).as("v"))))
          .as(s"__st_${carryCols.head}"),
        carryCols.tail.map(c =>
          max(when(col("__side") === 0 && col(c).isNotNull,
            struct(col("__ts").as("t"), col(c).as("v")))).as(s"__st_$c")): _*)
    val wB = Window.partitionBy(keys.map(col): _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = carryCols.foldLeft(spine) { (df, c) =>
      df.withColumn(s"__ci_$c",
        last(col(s"__st_$c"), ignoreNulls = true).over(wB)("v"))
    }.select((keys :+ "__b").map(col) ++ carryCols.map(c => col(s"__ci_$c")): _*)

    val filled = carryCols.foldLeft(
      inBucket.join(carryIn, keys :+ "__b", "left")) {
      (df, c) => df.withColumn(c, coalesce(col(c), col(s"__ci_$c")))
    }
    filled
      .filter(col("__side") === 1)
      .select((leftCols ++ carryCols).map(col): _*)
  }

  /** Nearest as-of (pandas merge_asof direction='nearest'), completing
    * the family: each left row takes whichever right row is closer in
    * time, earlier or later; exact ties go BACKWARD (the earlier row) —
    * a documented rule both engines apply identically. The plan is the
    * family's best: ONE union, ONE shuffle, ONE sort, and both
    * candidates come from two frames over the same window (last-non-null
    * over (-∞, current], first-non-null over (current+1, +∞)) — the
    * nearest join costs exactly what one directional join costs. Adds a
    * `matched_dir` column ('backward'/'forward'/null). Pre-dedup the
    * right side on (keys, ts) for a deterministic winner. */
  def joinAsOfNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String): DataFrame = {
    val carryCols = right.columns.filterNot(keys.contains).toSeq
    val leftCols = left.columns.toSeq
    val rightPlus = right.withColumn("__rts", col(rightTs))
    val carry = carryCols :+ "__rts"

    val taggedLeft = carry.foldLeft(
      left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))) {
      (df, c) =>
        val dt = if (c == "__rts") right.schema(rightTs).dataType
                 else right.schema(c).dataType
        df.withColumn(c, lit(null).cast(dt))
    }
    val taggedRight = leftCols.filterNot(keys.contains).foldLeft(
      rightPlus.withColumn("__ts", col(rightTs)).withColumn("__side", lit(0))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val w0 = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
    val wPrev = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = w0.rowsBetween(1, Window.unboundedFollowing)

    val both = carry.foldLeft(taggedLeft.unionByName(taggedRight)) { (df, c) =>
      df.withColumn(s"__b_$c", last(col(c), ignoreNulls = true).over(wPrev))
        .withColumn(s"__f_$c", first(col(c), ignoreNulls = true).over(wNext))
    }.filter(col("__side") === 1)

    val chooseB = col("__f___rts").isNull ||
      (col("__b___rts").isNotNull &&
        (col("__ts") - col("__b___rts")) <= (col("__f___rts") - col("__ts")))
    val picked = carryCols.foldLeft(both) { (df, c) =>
      df.withColumn(c, when(chooseB, col(s"__b_$c")).otherwise(col(s"__f_$c")))
    }.withColumn("matched_dir",
      when(col("__b___rts").isNull && col("__f___rts").isNull,
        lit(null).cast("string"))
        .when(chooseB, "backward").otherwise("forward"))

    picked.select((leftCols ++ carryCols :+ "matched_dir").map(col): _*)
  }
}
