package graft

import org.apache.spark.sql.SparkSession
import graft.mars.MarsPipeline

/** The SQL face of the engine: every base table and every warehouse model
  * registered as a temp view, so a user who lives in SQL (the reference's
  * users write dbt models — see SURVEY §2.9: its `view` materialization IS
  * "recompute per query") can `spark.sql(...)` over the whole surface
  * without touching the Scala API. Views are lazy plans, not snapshots:
  * each query re-reads current parquet, exactly like a dbt view.
  */
object SqlSurface {

  /** Star-schema + corpus tables under `sfDir`, by their oracle names. */
  def registerTables(spark: SparkSession, sfDir: String): Unit = {
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation", "region")
      .foreach(n => Tables.table(spark, sfDir, n).createOrReplaceTempView(n))
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
    Tables.documents(spark, sfDir).createOrReplaceTempView("documents")
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("embeddings")
  }

  /** The Mars warehouse: bronze-derived silver/dim/fact/mart models under
    * the reference's model names (dbt `schema.yml` naming). */
  def registerWarehouse(spark: SparkSession, p: MarsPipeline): Unit = {
    val models = Seq(
      "flat_photo_response" -> p.flatPhotoResponse,
      "flat_manifest_response" -> p.flatManifestResponse,
      "flat_manifest_photos" -> p.flatManifestPhotos,
      "flat_coordinate_response" -> p.flatCoordinateResponse,
      "dim_rovers" -> p.dimRovers,
      "dim_cameras" -> p.dimCameras,
      "dim_coordinate" -> p.dimCoordinate,
      "fact_photos" -> p.factPhotos,
      "fact_path" -> p.factPath,
      "validation_photo_gaps" -> p.validationPhotoGaps,
      "photo_summary" -> p.photoSummary,
      "daily_activity" -> p.dailyActivity,
      "camera_travel_correlation" -> p.cameraTravelCorrelation)
    models.foreach { case (name, df) => df.createOrReplaceTempView(name) }
  }

  def registerAll(spark: SparkSession, sfDir: String,
                  pipeline: Option[MarsPipeline] = None): Unit = {
    GraftFunctions.register(spark)
    registerTables(spark, sfDir)
    registerWarehouse(spark, pipeline.getOrElse(MarsPipeline.fixtures(spark)))
  }

  private def GraftFunctions = graft.functions.GraftFunctions
}
