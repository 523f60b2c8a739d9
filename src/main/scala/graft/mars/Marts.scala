package graft.mars

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gold marts (SURVEY §2.5 A2, §2.3 J3-J4, §2.2 P9-P10).
  *
  * Scale stance: the Perseverance constant filter (`rover_id = 8`) is
  * applied to the fact FIRST so Catalyst pushes it into the scan before
  * any join; the rover/camera dimension sides are `broadcast()` (rover dim
  * ≤4 rows, camera dim ≤~40 rows — bounded by hardware, not data) so the
  * photo fact — the 100 TB side — never shuffles for them. The sol-grain
  * path side grows with mission time, so it is size-gated
  * ([[graft.ops.AutoBroadcast]]) instead of pinned.
  */
object Marts {

  /** reference: models/marts/photo_summary.sql — per-rover mission summary
    * (pure projection of dim_rovers). */
  def photoSummary(dimRovers: DataFrame): DataFrame =
    dimRovers.select(
      col("rover_name"), col("status"), col("launch_date"), col("landing_date"),
      col("max_sol"), col("max_date"), col("total_photos"), col("ingestion_date"))

  /** reference: models/marts/daily_activity.sql — per-sol activity for
    * Perseverance: travel distance + day type + photo counts by camera
    * category (3-way LEFT join J4 + conditional-sum pivot A2 + COALESCE
    * defaulting P8).
    *
    * Grouping is on the RAW (pre-coalesce) day_type/length — photo-only
    * sols (no path row) group under NULL and surface as
    * 'Stationary'/0 via COALESCE, exactly like the reference.
    */
  def dailyActivity(factPhotos: DataFrame, dimRovers: DataFrame,
                    dimCameras: DataFrame, factPath: DataFrame): DataFrame = {
    val fph = factPhotos.filter(col("rover_id") === 8).as("fph")
    val dro = broadcast(dimRovers.select("rover_id", "rover_name")).as("dro")
    val dca = broadcast(dimCameras.select("rover_id", "camera_name", "camera_category")).as("dca")
    // Path is sol-grain — dim-like today, but it GROWS with mission time,
    // so unlike the true dims above it is size-gated rather than pinned:
    // small → broadcast (the photo fact never shuffles), big → shuffle
    // join. The estimate flows from the path fact's scan, a conservative
    // overestimate for the post-aggregation sol grain — errs toward
    // shuffling, never toward an OOM broadcast.
    val fpa = graft.ops.AutoBroadcast
      .sizeGate(factPath.select("rover_id", "sol", "day_type", "length")).as("fpa")

    fph
      .join(dro, col("fph.rover_id") === col("dro.rover_id"), "left_outer")
      .join(dca, col("fph.rover_id") === col("dca.rover_id") &&
        col("fph.camera_name") === col("dca.camera_name"), "left_outer")
      .join(fpa, col("fph.rover_id") === col("fpa.rover_id") &&
        col("fph.sol") === col("fpa.sol"), "left_outer")
      .groupBy(col("dro.rover_name"), col("fph.sol"), col("fpa.day_type"), col("fpa.length"))
      .agg(
        sum(when(col("dca.camera_category") === "Engineering", 1).otherwise(0))
          .as("engineering_photo_count"),
        sum(when(col("dca.camera_category") === "Science", 1).otherwise(0))
          .as("science_photo_count"),
        sum(when(col("dca.camera_category") === "Entry, Descent, and Landing", 1).otherwise(0))
          .as("edl_photo_count"),
        max(col("fph.ingestion_date")).as("ingestion_date"))
      .select(
        col("rover_name"),
        col("sol").as("sol_number"),
        coalesce(col("day_type"), lit("Stationary")).as("day_type"),
        coalesce(col("length"), lit(0.0)).as("travel_distance"),
        col("engineering_photo_count"), col("science_photo_count"),
        col("edl_photo_count"), col("ingestion_date"))
  }

  /** reference: models/marts/camera_travel_correlation.sql — was each
    * Perseverance photo taken while the rover was driving? SCLK capture
    * time is regex-extracted from the image URL (P9) and compared against
    * the drive segment's SCLK window (P10, BETWEEN-as-value). Multiple
    * path segments per sol fan photo rows out — reference semantics,
    * preserved (SURVEY §7.4.2).
    *
    * `nullif(.., '')` keeps Snowflake parity: REGEXP_SUBSTR yields NULL on
    * no-match where Spark's regexp_extract yields '' (SURVEY §2.2 P9).
    */
  def cameraTravelCorrelation(factPhotos: DataFrame, dimRovers: DataFrame,
                              dimCameras: DataFrame, factPath: DataFrame): DataFrame = {
    val photoWithTime = factPhotos
      .filter(col("rover_id") === 8)
      .select(
        col("rover_id"), col("sol"), col("camera_name"), col("img_src"),
        nullif(regexp_extract(col("img_src"), "_([0-9]{10})_", 1), lit(""))
          .cast("long").as("photo_time"),
        col("ingestion_date"))
      .as("pwt")
    val dro = broadcast(dimRovers.select("rover_id", "rover_name")).as("dro")
    val dca = broadcast(dimCameras.select("rover_id", "camera_name")).as("dca")
    val fpa = factPath.select("rover_id", "sol", "sclk_start", "sclk_end").as("fpa")

    photoWithTime
      .join(dro, col("pwt.rover_id") === col("dro.rover_id"))
      .join(dca, col("pwt.rover_id") === col("dca.rover_id") &&
        col("pwt.camera_name") === col("dca.camera_name"))
      .join(fpa, col("pwt.rover_id") === col("fpa.rover_id") &&
        col("pwt.sol") === col("fpa.sol"))
      .select(
        col("dro.rover_name").as("rover_name"),
        col("pwt.sol").as("sol_number"),
        col("dca.camera_name").as("camera_name"),
        col("fpa.sclk_start").as("travel_time_start"),
        col("fpa.sclk_end").as("travel_time_end"),
        col("pwt.img_src").as("image_link"),
        col("photo_time"),
        col("photo_time").between(col("fpa.sclk_start"), col("fpa.sclk_end"))
          .as("taken_during_travel"),
        col("pwt.ingestion_date").as("ingestion_date"))
  }
}
