package graft.mars

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Full-refresh wiring of the medallion pipeline over a bronze directory
  * (photos.jsonl / manifests.jsonl / coordinates.jsonl batch-envelope
  * files, FIXTURES.md §2-§4).
  *
  * Views are lazy DataFrames (the reference's materialized='view' models —
  * e.g. dbt/martian_moments/models/staging/fact_photos.sql:1-4,
  * dim_rovers.sql:1-5; SURVEY §2.9); incremental append/merge
  * materialization is layered on by `Incremental` when a target store is
  * used.
  */
final case class MarsPipeline(spark: SparkSession, bronzeDir: String) {

  lazy val rawPhotos: DataFrame = Bronze.rawPhotoResponse(spark, s"$bronzeDir/photos.jsonl")
  lazy val rawManifests: DataFrame = Bronze.rawManifestResponse(spark, s"$bronzeDir/manifests.jsonl")
  lazy val rawCoordinates: DataFrame = Bronze.rawCoordinateResponse(spark, s"$bronzeDir/coordinates.jsonl")

  lazy val flatPhotoResponse: DataFrame = Silver.flatPhotoResponse(rawPhotos)
  lazy val flatManifestResponse: DataFrame = Silver.flatManifestResponse(rawManifests)
  lazy val flatManifestPhotos: DataFrame = Silver.flatManifestPhotos(flatManifestResponse)
  lazy val flatCoordinateResponse: DataFrame = Silver.flatCoordinateResponse(rawCoordinates)

  lazy val dimRovers: DataFrame = Dims.dimRovers(flatManifestResponse)
  lazy val dimCameras: DataFrame = Dims.dimCameras(flatManifestResponse)
  lazy val dimCoordinate: DataFrame = Dims.dimCoordinate(flatCoordinateResponse, dimRovers)

  lazy val factPhotos: DataFrame = Facts.factPhotos(flatPhotoResponse)
  lazy val factPath: DataFrame = Facts.factPath(flatCoordinateResponse)

  lazy val validationPhotoGaps: DataFrame =
    Validation.validationPhotoGaps(flatManifestPhotos, flatPhotoResponse)

  lazy val photoSummary: DataFrame = Marts.photoSummary(dimRovers)
  lazy val dailyActivity: DataFrame =
    Marts.dailyActivity(factPhotos, dimRovers, dimCameras, factPath)
  lazy val cameraTravelCorrelation: DataFrame =
    Marts.cameraTravelCorrelation(factPhotos, dimRovers, dimCameras, factPath)
}

object MarsPipeline {
  /** Committed reference-shaped fixtures (tools/gen_mars_fixtures.py). */
  val defaultFixtureDir: String =
    sys.env.getOrElse("GRAFT_MARS_FIXTURES", "/root/repo/src/test/resources/mars/bronze")

  def fixtures(spark: SparkSession): MarsPipeline = MarsPipeline(spark, defaultFixtureDir)
}
