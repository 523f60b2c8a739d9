package graft.mars

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized (incremental) variant of the medallion pipeline: bronze
  * parquet tables → silver/gold parquet tables with the reference's dbt
  * materialization configs applied 1:1 (SURVEY §2.9):
  *
  *  | model                      | strategy | unique_key          | cluster_by |
  *  | flat_photo_response        | append   | (declared, no dedup)| rover_id, sol, earth_date |
  *  | flat_manifest_response     | merge    | rover_name          | rover_name |
  *  | flat_manifest_photos       | merge    | rover_name, sol     | rover_name, sol |
  *  | flat_coordinate_response   | merge    | rover_name, sol     | rover_name, sol |
  *  | photo_summary / daily_activity / camera_travel_correlation | append | — | per model |
  *
  * Views (dims/facts/validation) stay lazy — recomputed per query.
  * `MarsPipeline` is the view-only variant over raw fixtures; this is the
  * stateful store the orchestration loop writes through.
  *
  * reference: the dbt config blocks at
  * dbt/martian_moments/models/staging/flat_photo_response.sql:1-7 (append),
  * flat_manifest_response.sql:1-7 / flat_manifest_photos.sql:1-7 /
  * flat_coordinate_response.sql:1-7 (merge + unique_key), and the three
  * mart models' `:1-7` headers (append + cluster_by).
  */
final case class Warehouse(spark: SparkSession, root: String) {

  val bronzePhotos = s"$root/bronze/raw_photo_response"
  val bronzeManifests = s"$root/bronze/raw_manifest_response"
  val bronzeCoordinates = s"$root/bronze/raw_coordinate_response"

  val silverFlatPhotos = s"$root/silver/flat_photo_response"
  val silverFlatManifest = s"$root/silver/flat_manifest_response"
  val silverFlatManifestPhotos = s"$root/silver/flat_manifest_photos"
  val silverFlatCoordinates = s"$root/silver/flat_coordinate_response"

  val goldPhotoSummary = s"$root/gold/photo_summary"
  val goldDailyActivity = s"$root/gold/daily_activity"
  val goldCameraTravel = s"$root/gold/camera_travel_correlation"

  private def readOr(path: String, schemaOf: => DataFrame): DataFrame =
    if (Incremental.exists(spark, path)) Incremental.read(spark, path)
    else schemaOf.limit(0)

  /** Bronze loader (S9): one routed JSON object → typed append. */
  def loadBronze(objectPath: String, filename: String): String = {
    RoverKeys.route(filename) match {
      case "photos" =>
        Bronze.rawPhotoResponse(spark, objectPath)
          .write.mode("append").parquet(bronzePhotos)
        bronzePhotos
      case "coordinates" =>
        Bronze.rawCoordinateResponse(spark, objectPath)
          .write.mode("append").parquet(bronzeCoordinates)
        bronzeCoordinates
      case "manifests" =>
        Bronze.rawManifestResponse(spark, objectPath)
          .write.mode("append").parquet(bronzeManifests)
        bronzeManifests
      case _ => "UNKNOWN" // reference logs + skips unknown files
    }
  }

  /** dbt run --select tag:flatten equivalent (EP2 first stage). */
  def buildSilver(): Unit = {
    if (Incremental.exists(spark, bronzePhotos))
      Incremental.appendIncremental(spark, silverFlatPhotos,
        Silver.flatPhotoResponse(Incremental.read(spark, bronzePhotos)),
        clusterBy = Seq("rover_id", "sol", "earth_date"))
    if (Incremental.exists(spark, bronzeManifests)) {
      Incremental.mergeIncremental(spark, silverFlatManifest,
        Silver.flatManifestResponse(Incremental.read(spark, bronzeManifests)),
        keys = Seq("rover_name"), clusterBy = Seq("rover_name"))
      // flatten-inner: orphaned tag in the reference, but a hard dependency
      // of the validation view — built here (SURVEY §7.3 decision)
      Incremental.mergeIncremental(spark, silverFlatManifestPhotos,
        Silver.flatManifestPhotos(Incremental.read(spark, silverFlatManifest)),
        keys = Seq("rover_name", "sol"), clusterBy = Seq("rover_name", "sol"))
    }
    if (Incremental.exists(spark, bronzeCoordinates))
      Incremental.mergeIncremental(spark, silverFlatCoordinates,
        Silver.flatCoordinateResponse(Incremental.read(spark, bronzeCoordinates)),
        keys = Seq("rover_name", "sol"), clusterBy = Seq("rover_name", "sol"))
    // retention: the orchestrator loop re-merges these every batch — keep
    // current + one grace version so disk stays bounded instead of growing
    // one full snapshot per micro-batch. "Two versions" alone is NOT a
    // reader grace under a fast trigger (sub-second batches would sweep a
    // snapshot mid-scan), so the wall-clock grace below is what actually
    // protects a concurrent reader of the public warehouse views — a
    // pinned version is deletable only after it is BOTH superseded twice
    // and 10 minutes cold, the Delta VACUUM retention shape.
    Seq(silverFlatManifest, silverFlatManifestPhotos, silverFlatCoordinates)
      .foreach(t => Incremental.vacuum(spark, t, keep = 2,
        minAgeMs = 10L * 60 * 1000))
  }

  // lazy views over the materialized silver
  def flatPhotos: DataFrame = readOr(silverFlatPhotos,
    Silver.flatPhotoResponse(Bronze.rawPhotoResponse(spark, "/nonexistent")))
  def flatManifest: DataFrame = readOr(silverFlatManifest,
    Silver.flatManifestResponse(Bronze.rawManifestResponse(spark, "/nonexistent")))
  def flatManifestPhotos: DataFrame = readOr(silverFlatManifestPhotos,
    Silver.flatManifestPhotos(flatManifest))
  def flatCoordinates: DataFrame = readOr(silverFlatCoordinates,
    Silver.flatCoordinateResponse(Bronze.rawCoordinateResponse(spark, "/nonexistent")))

  def dimRovers: DataFrame = Dims.dimRovers(flatManifest)
  def dimCameras: DataFrame = Dims.dimCameras(flatManifest)
  def factPhotos: DataFrame = Facts.factPhotos(flatPhotos)
  def factPath: DataFrame = Facts.factPath(flatCoordinates)
  def validationPhotoGaps: DataFrame =
    Validation.validationPhotoGaps(flatManifestPhotos, flatPhotos)

  /** dbt run --select tag:aggregate equivalent (EP2 second stage). */
  def buildGold(): Unit = {
    Incremental.appendIncremental(spark, goldPhotoSummary,
      Marts.photoSummary(dimRovers), clusterBy = Seq("rover_name"))
    Incremental.appendIncremental(spark, goldDailyActivity,
      Marts.dailyActivity(factPhotos, dimRovers, dimCameras, factPath),
      clusterBy = Seq("rover_name", "sol_number"))
    Incremental.appendIncremental(spark, goldCameraTravel,
      Marts.cameraTravelCorrelation(factPhotos, dimRovers, dimCameras, factPath),
      clusterBy = Seq("rover_name", "sol_number"))
  }
}
