package graft.mars

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fact views (SURVEY §2: P2, P6, P8). */
object Facts {

  /** reference: models/staging/fact_photos.sql — 8-column subset+rename of
    * FLAT_PHOTO_RESPONSE (camera_id → nasa_camera_id). */
  def factPhotos(flatPhotos: DataFrame): DataFrame =
    flatPhotos.select(
      col("image_id"),
      col("camera_id").as("nasa_camera_id"),
      col("camera_name"),
      col("sol"),
      col("rover_id"),
      col("earth_date"),
      col("img_src"),
      col("ingestion_date"))

  /** reference: models/staging/fact_path.sql — rover key CASE (P5),
    * COALESCE defaulting (P8), day-type bucketing on the RAW length (P6:
    * NULL/0 → Stationary even though the selected column is coalesced). */
  def factPath(flatCoordinates: DataFrame): DataFrame =
    flatCoordinates.select(
      RoverKeys.roverId(col("rover_name")).as("rover_id"),
      col("sol"),
      col("from_rmc"),
      col("to_rmc"),
      coalesce(col("length"), lit(0.0)).as("length"),
      col("sclk_start"),
      col("sclk_end"),
      RoverKeys.dayType(col("length")).as("day_type"),
      col("ingestion_date"))
}
