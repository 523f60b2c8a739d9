package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic star schema (TESTDATA.md).
  *
  * Each table is one parquet file under an sf directory. Readers are plain
  * `spark.read.parquet` so Catalyst gets full pushdown/pruning: filters and
  * projections in downstream queries reach the scan (`PushedFilters` /
  * `ReadSchema` in explain output). At 100 TB these would be directory-
  * partitioned datasets; the call sites stay identical.
  */
object Tables {
  // Memoized per (session, path): `spark.read.parquet` eagerly lists the
  // path and reads footers for schema on EVERY call — measurable fixed
  // cost when dozens of queries each re-open the same tables. The cached
  // value is a lazy plan over a cached FileIndex, not data: downstream
  // pushdown/pruning per query is unaffected, and new sessions get fresh
  // entries. (A long-lived service would invalidate on data arrival; the
  // engine's write paths create NEW directories, never mutate these.)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def cached(spark: SparkSession, path: String)
                    (load: => DataFrame): DataFrame =
    cache.computeIfAbsent((spark, path), _ => load)

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cached(spark, s"$sfDir/$name.parquet") {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** `events.ts` arrives in whatever physical type the driver's testdata
    * generator last used — TIMESTAMP(NANOS), TIMESTAMP(MICROS) without a
    * UTC flag, or plain micros — so normalize on the OBSERVED type, not
    * the path:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it outright;
    *    read nanos as raw longs (legacy conf) and rebuild TimestampType
    *    at microsecond precision (sub-microsecond detail is below every
    *    query's granularity).
    *  - TIMESTAMP(MICROS) with isAdjustedToUTC=false reads as
    *    TIMESTAMP_NTZ; cast to TimestampType — value-preserving under
    *    the UTC session timezone all entry points pin — so downstream
    *    code and specs see ONE timestamp type regardless of generator
    *    vintage.
    *  - TimestampType passes through untouched. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val t = table(spark, sfDir, "events")
    t.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        t.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        t.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => t
    }
  }
  /** The corpus tables feed CPU-bound per-row operators (shingling, token
    * hashing, vector arithmetic), so scan parallelism — not IO — decides
    * their wall-clock. The local testdata files are a single parquet row
    * group, which Spark cannot split: the scan yields ONE task and the
    * whole operator runs single-threaded. Rebalance up to the session's
    * parallelism when the scan under-splits; on a cluster where 100 TB
    * arrives as ~100k splits the condition is false and this is a no-op.
    */
  private def rebalanced(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def documents(spark: SparkSession, sfDir: String): DataFrame = {
    // resolve the base entry BEFORE the outer memoization: nesting
    // computeIfAbsent calls on one ConcurrentHashMap throws
    // IllegalStateException("Recursive update")
    val base = table(spark, sfDir, "documents")
    cached(spark, s"$sfDir/documents.parquet#rebalanced")(rebalanced(spark, base))
  }
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = {
    val base = table(spark, sfDir, "embeddings")
    cached(spark, s"$sfDir/embeddings.parquet#rebalanced")(rebalanced(spark, base))
  }
}
