package graft.mars

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The four silver flatten models (SURVEY §2.4 G1-G4 + §2.2 P1-P2).
  *
  * Each is a pure bronze→silver DataFrame function: one `explode`
  * (Snowflake LATERAL FLATTEN → Spark Generate node) followed by typed
  * nested-field projections. All column lists and casts mirror the dbt
  * models 1:1; incremental watermarking is orthogonal and lives in
  * `Incremental` (§2.9) so the transform itself stays a full-relation
  * expression Catalyst can freely optimize.
  *
  * Scale note: explode is narrow (no shuffle); the projections are struct
  * field extractions inside whole-stage codegen. At 100 TB the only cost
  * is the scan itself, and column pruning pushes the needed subfields into
  * the reader.
  */
object Silver {

  /** reference: models/staging/flat_photo_response.sql:10-26 (G1+P1). */
  def flatPhotoResponse(rawPhotos: DataFrame): DataFrame =
    rawPhotos
      .select(explode(col("photos")).as("photo"), col("filename"), col("ingestion_date"))
      .select(
        col("photo.rover.id").cast("int").as("rover_id"),
        col("photo.rover.name").cast("string").as("rover_name"),
        col("photo.rover.landing_date").cast("date").as("landing_date"),
        col("photo.rover.launch_date").cast("date").as("launch_date"),
        col("photo.rover.status").cast("string").as("rover_status"),
        col("photo.sol").cast("int").as("sol"),
        col("photo.earth_date").cast("date").as("earth_date"),
        col("photo.camera.id").cast("int").as("camera_id"),
        col("photo.camera.name").cast("string").as("camera_name"),
        col("photo.camera.full_name").cast("string").as("camera_full_name"),
        col("photo.img_src").cast("string").as("img_src"),
        col("photo.id").cast("int").as("image_id"),
        col("filename"),
        col("ingestion_date"))

  /** reference: models/staging/flat_manifest_response.sql:10-21 (G2).
    * Keeps the nested per-sol `photos` array as a typed column (the
    * reference keeps it as ::variant). */
  def flatManifestResponse(rawManifests: DataFrame): DataFrame =
    rawManifests
      .select(explode(col("manifests")).as("manifest"), col("ingestion_date"))
      .select(
        col("manifest.name").cast("string").as("rover_name"),
        col("manifest.status").cast("string").as("status"),
        col("manifest.max_sol").cast("int").as("max_sol"),
        col("manifest.max_date").cast("date").as("max_date"),
        col("manifest.total_photos").cast("int").as("total_photos"),
        col("manifest.launch_date").cast("date").as("launch_date"),
        col("manifest.landing_date").cast("date").as("landing_date"),
        col("manifest.photos").as("photos"),
        col("ingestion_date"))

  /** reference: models/staging/flat_manifest_photos.sql:9-18 (G3).
    * Input is flat_manifest_response output (silver→silver). */
  def flatManifestPhotos(flatManifest: DataFrame): DataFrame =
    flatManifest
      .select(col("rover_name"), explode(col("photos")).as("sol_stat"), col("ingestion_date"))
      .select(
        col("rover_name"),
        col("sol_stat.sol").cast("int").as("sol"),
        col("sol_stat.earth_date").cast("date").as("earth_date"),
        col("sol_stat.total_photos").cast("int").as("manifest_total_photos"),
        size(col("sol_stat.cameras")).as("manifest_camera_count"),
        col("ingestion_date"))

  /** reference: models/staging/flat_coordinate_response.sql:9-20 (explode
    * the feature array; geometry.coordinates stays a nested array for
    * dim_coordinate's ordinal flatten). */
  def flatCoordinateResponse(rawCoordinates: DataFrame): DataFrame =
    rawCoordinates
      .select(explode(col("coordinates")).as("coordinate"), col("ingestion_date"))
      .select(
        col("coordinate.rover_name").cast("string").as("rover_name"),
        col("coordinate.geometry.coordinates").as("coordinates"),
        col("coordinate.properties.sol").cast("int").as("sol"),
        col("coordinate.properties.fromRMC").cast("string").as("from_rmc"),
        col("coordinate.properties.toRMC").cast("string").as("to_rmc"),
        col("coordinate.properties.length").cast("double").as("length"),
        col("coordinate.properties.SCLK_START").cast("long").as("sclk_start"),
        col("coordinate.properties.SCLK_END").cast("long").as("sclk_end"),
        col("ingestion_date"))
}
