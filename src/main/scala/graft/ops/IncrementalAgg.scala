package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental AGGREGATE maintenance: keep a grouped mart current by
  * combining stored partial aggregates with each new batch's partials —
  * history is never recomputed and never re-read beyond the (key-grain,
  * small) partial table. This is the step past graft.mars.Incremental's
  * row-level append/merge: dbt users hand-roll exactly this pattern for
  * incremental aggregate models.
  *
  * Only COMBINABLE aggregates are stored (count/sum/min/max — algebraic
  * partials that merge associatively); averages are derived as sum/count
  * at read time via [[withAverages]]. That restriction is what makes the
  * update O(|batch| + |keys|) instead of O(|history|): the combine is
  * `stored ∪ batch-partials → groupBy(keys) → re-reduce`, a shuffle of
  * two key-grain tables. Updates go to a temp path and swap (never
  * overwrite a path being read).
  */
object IncrementalAgg {

  private[graft] def partials(batch: DataFrame, keys: Seq[String], sums: Seq[String],
                       mins: Seq[String], maxs: Seq[String],
                       counts: Seq[String] = Nil,
                       kmvs: Seq[String] = Nil, kmvK: Int = 64,
                       hists: Seq[String] = Nil, histWidth: Int = 8,
                       hlls: Seq[String] = Nil, hllLgK: Int = 12): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      (sums.map(c => sum(col(c)).as(s"sum_$c")) ++
        mins.map(c => min(col(c)).as(s"min_$c")) ++
        maxs.map(c => max(col(c)).as(s"max_$c")) ++
        // NON-NULL value count — the partial that makes AVG over a
        // nullable measure exactly answerable (MvRewrite valueCountCols)
        counts.map(c => count(col(c)).as(s"cnt_$c")) ++
        // KMV distinct sketch per group (r7): column must be BIGINT
        // (hash values first — md5Long); maintained by kmin_merge below,
        // served by MvRewrite's kmvCols. Insert-only mergeable — the
        // retraction path (applyChanges) deliberately has no kmv arm.
        kmvs.map(c => call_function("kmin_values", col(c), lit(kmvK))
          .as(s"kmv_$c")) ++
        // fixed-grid histogram cells per group (r8): the percentile
        // partial — maintained by hist_merge below, served by MvRewrite's
        // histCols for hist_quantile reads. Insert-only like kmv. The
        // grid WIDTH is part of the column name: cells from different
        // grids are bucket-incompatible, and the name makes a
        // mixed-width maintenance call fail LOUDLY in combine's
        // unionByName instead of silently merging wrong buckets
        hists.map(c => call_function("hist_cells", col(c), lit(histWidth))
          .as(s"hist_${c}_w$histWidth")) ++
        // HLL sketch per group (r9): Spark-native datasketches partial —
        // binary, mergeable by register-wise max. The estimate served
        // from merged partials carries the same lgK error contract as
        // the direct read and coincides with it exactly at dense
        // register state; at sparse state BOTH are merge-tree-variant
        // (the direct read included — see MvRewrite.register's measured
        // numbers). Insert-only like kmv: an HLL register cannot be
        // un-maxed, so applyChanges has no hll arm. The lgK is part of
        // the column name for the same loud-mismatch reason as hist's
        // grid width
        hlls.map(c => expr(s"hll_sketch_agg($c, $hllLgK)")
          .as(s"hll_${c}_k$hllLgK")))
    batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private[graft] def combine(a: DataFrame, b: DataFrame, keys: Seq[String],
                      sums: Seq[String], mins: Seq[String],
                      maxs: Seq[String], counts: Seq[String] = Nil,
                      kmvs: Seq[String] = Nil, kmvK: Int = 64,
                      hists: Seq[String] = Nil, histWidth: Int = 8,
                      hlls: Seq[String] = Nil, hllLgK: Int = 12): DataFrame = {
    val aggs = sum(col("n_rows")).as("n_rows") +:
      (sums.map(c => sum(col(s"sum_$c")).as(s"sum_$c")) ++
        mins.map(c => min(col(s"min_$c")).as(s"min_$c")) ++
        maxs.map(c => max(col(s"max_$c")).as(s"max_$c")) ++
        counts.map(c => sum(col(s"cnt_$c")).as(s"cnt_$c")) ++
        kmvs.map(c => call_function("kmin_merge", col(s"kmv_$c"), lit(kmvK))
          .as(s"kmv_$c")) ++
        hists.map(c => call_function("hist_merge", col(s"hist_${c}_w$histWidth"))
          .as(s"hist_${c}_w$histWidth")) ++
        // allowDifferentLgConfigK=false: a mixed-lgK fold must fail
        // loudly (the name suffix already makes it a missing column)
        hlls.map(c => expr(s"hll_union_agg(hll_${c}_k$hllLgK, false)")
          .as(s"hll_${c}_k$hllLgK")))
    a.unionByName(b).groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold one batch into the stored partial-aggregate table. */
  def update(spark: SparkSession, storeDir: String, batch: DataFrame,
             keys: Seq[String], sums: Seq[String] = Nil,
             mins: Seq[String] = Nil, maxs: Seq[String] = Nil,
             counts: Seq[String] = Nil,
             kmvs: Seq[String] = Nil, kmvK: Int = 64,
             hists: Seq[String] = Nil, histWidth: Int = 8,
             hlls: Seq[String] = Nil, hllLgK: Int = 12): Unit = {
    if (kmvs.nonEmpty || hists.nonEmpty)
      graft.functions.GraftFunctions.register(spark)
    val p = partials(batch, keys, sums, mins, maxs, counts, kmvs, kmvK,
      hists, histWidth, hlls, hllLgK)
    val path = new Path(storeDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) {
      p.write.mode(SaveMode.Overwrite).parquet(storeDir)
    } else {
      val merged = combine(spark.read.parquet(storeDir), p, keys, sums, mins,
        maxs, counts, kmvs, kmvK, hists, histWidth, hlls, hllLgK)
      val tmp = storeDir + ".tmp_swap"
      merged.write.mode(SaveMode.Overwrite).parquet(tmp)
      fs.delete(path, true)
      fs.rename(new Path(tmp), path)
    }
  }

  /** CDC-driven maintenance: fold a change feed
    * ([[graft.mars.Incremental.changesBetween]] shape: keys…,
    * change_type, _before, _after) into the stored partials by
    * RETRACTION — insert adds the after-image, delete subtracts the
    * before-image, update does both — so the mart absorbs updates and
    * deletes from the feed alone, never re-reading history. Groups whose
    * row count retracts to zero are dropped.
    *
    * Only invertible aggregates maintain this way (count/sum, avg
    * derived at read; beware float residue on long-lived double sums —
    * re-baseline periodically). min/max are NOT invertible — a deleted
    * minimum cannot be un-taken from a partial — so when the store
    * carries them the caller must pass `current` (the table's new
    * version) and every group the feed touches is re-aggregated from it:
    * a semi-join-bounded partial recompute, the standard IVM fallback
    * tier. Untouched groups are never recomputed on either path.
    *
    * The feed's key columns must be the AGGREGATE's grouping keys. An
    * update that MOVES a row between groups must arrive as two feed rows
    * (delete under the old key, insert under the new) — the shape a
    * grouped projection of [[graft.mars.Incremental.changesBetween]]
    * naturally produces only when the grouping key is immutable, which
    * is the usual mart contract.
    *
    * `hists` maintains fixed-grid histogram-cell partials under
    * retraction (r9): unlike KMV — an order statistic, not invertible,
    * deliberately absent here — histogram cells ARE exactly invertible:
    * a delete subtracts 1 from the before-image's bucket, an insert adds
    * 1 to the after-image's, zero-count cells are dropped, and the
    * result is identical to recomputing the cells from the surviving
    * rows. A bucket retracting below zero means the feed removed rows
    * the mart never absorbed — that raises (raise_error in the cleanup
    * projection) instead of persisting a corrupt negative histogram. */
  def applyChanges(spark: SparkSession, storeDir: String, changes: DataFrame,
                   keys: Seq[String], sums: Seq[String] = Nil,
                   mins: Seq[String] = Nil, maxs: Seq[String] = Nil,
                   current: Option[DataFrame] = None,
                   counts: Seq[String] = Nil,
                   hists: Seq[String] = Nil, histWidth: Int = 8): Unit = {
    if (hists.nonEmpty) graft.functions.GraftFunctions.register(spark)
    val path = new Path(storeDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(path), s"no aggregate store at $storeDir — seed with update()")
    val stored = spark.read.parquet(storeDir)
    val ct = col("change_type")
    // same floorDiv as HistCells.update: (v - pmod(v, w)) div w is exact
    // integer floor-division for the positive grid width
    def bucketOf(img: String, c: String) =
      s"(CAST($img.$c AS BIGINT) - pmod(CAST($img.$c AS BIGINT), $histWidth)) div $histWidth"
    // drop zero-count cells after the merge (a stored partial never
    // carries them, so retraction-maintained cells stay byte-comparable
    // to recomputed ones); a negative residue is a corrupt feed → raise
    def cleanHists(df: DataFrame): DataFrame =
      hists.foldLeft(df) { (d, c) =>
        val cn = s"hist_${c}_w$histWidth"
        d.withColumn(cn, expr(
          s"CASE WHEN assert_true(NOT exists($cn, x -> x.cnt < 0), " +
            s"'hist retraction underflow on $cn: feed retracted rows the mart never absorbed') IS NULL " +
            s"THEN filter($cn, x -> x.cnt != 0) END"))
      }
    val merged =
      if (mins.isEmpty && maxs.isEmpty) {
        // pure retraction: one pass over the (change-sized) feed
        val deltaAggs = sum(when(ct === "insert", 1)
          .when(ct === "delete", -1).otherwise(0)).as("n_rows") +:
          (sums.map { c =>
            sum(coalesce(when(ct =!= "delete", col(s"_after.$c")), lit(0)) -
              coalesce(when(ct =!= "insert", col(s"_before.$c")), lit(0)))
              .as(s"sum_$c")
          } ++
          // value counts retract like sums: +1 per surviving non-null
          // after-image, -1 per replaced non-null before-image
          counts.map { c =>
            sum(coalesce(when(ct =!= "delete" &&
                  col(s"_after.$c").isNotNull, 1), lit(0)) -
                coalesce(when(ct =!= "insert" &&
                  col(s"_before.$c").isNotNull, 1), lit(0)))
              .as(s"cnt_$c")
          } ++
          // histogram cells retract by signed cell deltas: hist_merge
          // sums counts per bucket, so (+1 after, -1 before) per row
          // folds to exactly the recomputed histogram of the survivors
          hists.map { c =>
            val empty = "CAST(array() AS ARRAY<STRUCT<bucket: BIGINT, cnt: BIGINT>>)"
            val deltaCells = expr(
              s"concat(" +
                s"CASE WHEN change_type != 'delete' AND _after.$c IS NOT NULL " +
                s"THEN array(named_struct('bucket', ${bucketOf("_after", c)}, 'cnt', 1L)) " +
                s"ELSE $empty END, " +
                s"CASE WHEN change_type != 'insert' AND _before.$c IS NOT NULL " +
                s"THEN array(named_struct('bucket', ${bucketOf("_before", c)}, 'cnt', -1L)) " +
                s"ELSE $empty END)")
            call_function("hist_merge", deltaCells).as(s"hist_${c}_w$histWidth")
          })
        val delta = changes.groupBy(keys.map(col): _*)
          .agg(deltaAggs.head, deltaAggs.tail: _*)
        cleanHists(
          combine(stored, delta, keys, sums, Nil, Nil, counts,
            hists = hists, histWidth = histWidth)
            .filter(col("n_rows") > 0))
      } else {
        // affected-group recompute: min/max need the surviving values
        val cur = current.getOrElse(throw new IllegalArgumentException(
          "min/max maintenance needs `current` — they are not invertible"))
        val affected = changes.select(keys.map(col): _*).distinct()
        stored.join(AutoBroadcast.sizeGate(affected), keys, "left_anti")
          .unionByName(
            partials(cur.join(AutoBroadcast.sizeGate(affected), keys, "left_semi"),
              keys, sums, mins, maxs, counts, hists = hists,
              histWidth = histWidth))
      }
    val tmp = storeDir + ".tmp_swap"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    fs.delete(path, true)
    fs.rename(new Path(tmp), path)
  }

  /** Read the maintained mart, deriving avg_X = sum_X / cnt_X when the
    * non-null value-count partial is maintained (exact for nullable
    * measures), else sum_X / n_rows (exact only when X is never null). */
  def read(spark: SparkSession, storeDir: String,
           avgsOf: Seq[String] = Nil): DataFrame = {
    val base = spark.read.parquet(storeDir)
    avgsOf.foldLeft(base) { (df, c) =>
      val denom = if (df.columns.contains(s"cnt_$c")) col(s"cnt_$c")
                  else col("n_rows")
      df.withColumn(s"avg_$c", col(s"sum_$c") / denom)
    }
  }
}
