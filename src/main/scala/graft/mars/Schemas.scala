package graft.mars

import org.apache.spark.sql.types._

/** Bronze StructTypes for the three reference-shaped feeds (FIXTURES.md).
  *
  * The reference loads these as schema-on-read VARIANT JSON
  * (reference: src/utils/snowflake.py:45-51, COPY INTO ... TYPE='JSON'
  * MATCH_BY_COLUMN_NAME=CASE_INSENSITIVE ON_ERROR='CONTINUE'). The payload
  * schemas are stable, so the Spark-idiomatic choice is explicit typed
  * StructTypes + PERMISSIVE mode: case-insensitive field matching and
  * skip-bad-records behavior both come for free, and every downstream
  * access is a codegen'd struct field read instead of dynamic JSON
  * traversal.
  *
  * ingestion_date stays an ISO-8601 *string* end-to-end, matching the
  * reference (src/ingestion/photos.py:35) whose watermark compares
  * strings with `>` — ISO ordering makes that correct (SURVEY §7.4.5).
  */
object Schemas {

  // ---- photos feed (reference: tests/test_photos.py:11-34) ----
  val camera: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType),
    StructField("rover_id", IntegerType),
    StructField("full_name", StringType)))

  val rover: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType),
    StructField("landing_date", StringType), // cast to date in silver
    StructField("launch_date", StringType),
    StructField("status", StringType)))

  val photo: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("sol", IntegerType),
    StructField("camera", camera),
    StructField("img_src", StringType),
    StructField("earth_date", StringType),
    StructField("rover", rover)))

  /** Bronze RAW_PHOTO_RESPONSE row (reference: src/ingestion/photos.py:38-45). */
  val photoBatch: StructType = StructType(Seq(
    StructField("filename", StringType),
    StructField("sol_start", IntegerType),
    StructField("sol_end", IntegerType),
    StructField("photo_count", IntegerType),
    StructField("photos", ArrayType(photo)),
    StructField("ingestion_date", StringType)))

  // ---- manifests feed (reference: tests/test_manifest.py:12-37) ----
  val manifestSol: StructType = StructType(Seq(
    StructField("sol", IntegerType),
    StructField("earth_date", StringType),
    StructField("total_photos", IntegerType),
    StructField("cameras", ArrayType(StringType))))

  val manifest: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("landing_date", StringType),
    StructField("launch_date", StringType),
    StructField("status", StringType),
    StructField("max_sol", IntegerType),
    StructField("max_date", StringType),
    StructField("total_photos", IntegerType),
    StructField("photos", ArrayType(manifestSol))))

  /** Bronze RAW_MANIFEST_RESPONSE row (reference: src/ingestion/manifest.py:35-39). */
  val manifestBatch: StructType = StructType(Seq(
    StructField("filename", StringType),
    StructField("manifests", ArrayType(manifest)),
    StructField("ingestion_date", StringType)))

  // ---- traverse GeoJSON feed (reference: tests/test_coordinates.py:10-35) ----
  val geometry: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("coordinates", ArrayType(ArrayType(DoubleType)))))

  /** SCLK values are spacecraft-clock seconds (~7.7e8 today); LongType so a
    * 100 TB-scale future never wraps (reference casts ::int —
    * flat_coordinate_response.sql:16 — but Snowflake's INT is arbitrary-
    * precision NUMBER, so Long is the faithful mapping). */
  val featureProperties: StructType = StructType(Seq(
    StructField("sol", IntegerType),
    StructField("fromRMC", StringType),
    StructField("toRMC", StringType),
    StructField("length", DoubleType),
    StructField("SCLK_START", LongType),
    StructField("SCLK_END", LongType)))

  val feature: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("rover_name", StringType), // injected by ingestion (coordinates.py:37-40)
    StructField("geometry", geometry),
    StructField("properties", featureProperties)))

  /** Bronze RAW_COORDINATE_RESPONSE row (reference: src/ingestion/coordinates.py:46-51). */
  val coordinateBatch: StructType = StructType(Seq(
    StructField("filename", StringType),
    StructField("coordinate_count", IntegerType),
    StructField("coordinates", ArrayType(feature)),
    StructField("ingestion_date", StringType)))
}
