package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.mars.MarsPipeline

/** Driver-verifiable surface for the Mars medallion pipeline.
  *
  * Each entry runs one silver/gold model over the committed
  * reference-shaped bronze fixtures (tools/gen_mars_fixtures.py) and is
  * hash-compared against a DuckDB oracle that re-derives the same model
  * from the same JSON files — so the semantics of every dbt model in the
  * reference are oracle-checked, not just unit-tested.
  *
  * These queries intentionally ignore the sfDir argument (the star-schema
  * operators in `Relational` cover that surface); array-typed columns
  * (manifest photos, waypoint arrays) are dropped from driver-facing
  * output because the hash compare is defined over scalars — the arrays
  * are exercised by MarsPipelineSpec instead.
  */
object MarsOps extends OpsModule {

  private val fix = MarsPipeline.defaultFixtureDir

  private def p(s: SparkSession): MarsPipeline = MarsPipeline.fixtures(s)

  // ---- shared DuckDB CTE snippets over the same fixtures ----

  private val duckFlatPhotos =
    s"""flat_photos AS (
        SELECT CAST(photo.rover.id AS INT) AS rover_id,
               photo.rover.name AS rover_name,
               CAST(photo.rover.landing_date AS DATE) AS landing_date,
               CAST(photo.rover.launch_date AS DATE) AS launch_date,
               photo.rover.status AS rover_status,
               CAST(photo.sol AS INT) AS sol,
               CAST(photo.earth_date AS DATE) AS earth_date,
               CAST(photo.camera.id AS INT) AS camera_id,
               photo.camera.name AS camera_name,
               photo.camera.full_name AS camera_full_name,
               photo.img_src AS img_src,
               CAST(photo.id AS INT) AS image_id,
               filename, ingestion_date
        FROM (SELECT unnest(photos) AS photo, filename, ingestion_date
              FROM read_json_auto('$fix/photos.jsonl')))"""

  private val duckFlatManifest =
    s"""flat_manifest AS (
        SELECT m.name AS rover_name, m.status AS status,
               CAST(m.max_sol AS INT) AS max_sol,
               CAST(m.max_date AS DATE) AS max_date,
               CAST(m.total_photos AS INT) AS total_photos,
               CAST(m.launch_date AS DATE) AS launch_date,
               CAST(m.landing_date AS DATE) AS landing_date,
               m.photos AS photos, ingestion_date
        FROM (SELECT unnest(manifests) AS m, ingestion_date
              FROM read_json_auto('$fix/manifests.jsonl')))"""

  private val duckFlatManifestPhotos =
    s"""flat_manifest_photos AS (
        SELECT rover_name, CAST(sol_stat.sol AS INT) AS sol,
               CAST(sol_stat.earth_date AS DATE) AS earth_date,
               CAST(sol_stat.total_photos AS INT) AS manifest_total_photos,
               len(sol_stat.cameras) AS manifest_camera_count,
               ingestion_date
        FROM (SELECT rover_name, unnest(photos) AS sol_stat, ingestion_date
              FROM flat_manifest))"""

  private val duckFlatCoordinates =
    s"""flat_coordinates AS (
        SELECT f.rover_name AS rover_name,
               f.geometry.coordinates AS coordinates,
               CAST(f.properties.sol AS INT) AS sol,
               f.properties.fromRMC AS from_rmc,
               f.properties.toRMC AS to_rmc,
               CAST(f.properties.length AS DOUBLE) AS length,
               CAST(f.properties.SCLK_START AS BIGINT) AS sclk_start,
               CAST(f.properties.SCLK_END AS BIGINT) AS sclk_end,
               ingestion_date
        FROM (SELECT unnest(coordinates) AS f, ingestion_date
              FROM read_json_auto('$fix/coordinates.jsonl')))"""

  private val duckRoverIdCase =
    """CASE rover_name WHEN 'Perseverance' THEN 8 WHEN 'Spirit' THEN 7
       WHEN 'Opportunity' THEN 6 WHEN 'Curiosity' THEN 5 ELSE 0 END"""

  private val duckDimRovers =
    s"""dim_rovers AS (
        SELECT $duckRoverIdCase AS rover_id, rover_name, status, launch_date,
               landing_date, max_sol, max_date, total_photos, ingestion_date
        FROM flat_manifest)"""

  private val duckCameraCategoryCase =
    """CASE
       WHEN camera_name IN ('NAVCAM_LEFT','NAVCAM_RIGHT','FRONT_HAZCAM_LEFT_A','FRONT_HAZCAM_RIGHT_A','REAR_HAZCAM_LEFT','REAR_HAZCAM_RIGHT','NAVCAM','FHAZ','RHAZ','FHAZ_LEFT_B','FHAZ_RIGHT_B','RHAZ_LEFT_B','RHAZ_RIGHT_B','NAV_RIGHT_B','NAV_LEFT_B','PANCAM') THEN 'Engineering'
       WHEN camera_name IN ('MCZ_RIGHT','MCZ_LEFT','SHERLOC_WATSON','SUPERCAM_RMI','SKYCAM','MINITES','CHEMCAM','CHEMCAM_RMI','MAST','MAST_LEFT','MAST_RIGHT','MAHLI') THEN 'Science'
       WHEN camera_name IN ('EDL_RUCAM','EDL_RDCAM','EDL_PUCAM1','EDL_PUCAM2','EDL_DDCAM','ENTRY','MARDI') THEN 'Entry, Descent, and Landing'
       ELSE 'Other' END"""

  private val duckDimCameras =
    s"""dim_cameras AS (
        SELECT rover_id, camera_name,
               ROW_NUMBER() OVER (ORDER BY camera_name, rover_id) AS camera_id,
               camera_category
        FROM (SELECT DISTINCT $duckRoverIdCase AS rover_id, camera_name,
                     $duckCameraCategoryCase AS camera_category
              FROM (SELECT rover_name, unnest(sol_stat.cameras) AS camera_name
                    FROM (SELECT rover_name, unnest(photos) AS sol_stat
                          FROM flat_manifest))))"""

  private val duckFactPhotos =
    """fact_photos AS (
       SELECT image_id, camera_id AS nasa_camera_id, camera_name, sol,
              rover_id, earth_date, img_src, ingestion_date
       FROM flat_photos)"""

  private val duckFactPath =
    s"""fact_path AS (
        SELECT $duckRoverIdCase AS rover_id, sol, from_rmc, to_rmc,
               coalesce(length, 0) AS length, sclk_start, sclk_end,
               CASE WHEN length IS NULL OR length = 0 THEN 'Stationary'
                    WHEN length < 5 THEN 'Minimal Movement'
                    WHEN length < 20 THEN 'Short Travel'
                    ELSE 'Long Travel' END AS day_type,
               ingestion_date
        FROM flat_coordinates)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mars_flat_photos" -> ((s, _) =>
      p(s).flatPhotoResponse.orderBy("image_id")),

    "mars_flat_manifest" -> ((s, _) =>
      p(s).flatManifestResponse.drop("photos").orderBy("rover_name")),

    "mars_flat_manifest_photos" -> ((s, _) =>
      p(s).flatManifestPhotos.orderBy("rover_name", "sol")),

    "mars_flat_coordinates" -> ((s, _) =>
      p(s).flatCoordinateResponse.drop("coordinates")
        .orderBy("rover_name", "sol", "from_rmc")),

    "mars_dim_rovers" -> ((s, _) =>
      p(s).dimRovers.orderBy("rover_id")),

    "mars_dim_cameras" -> ((s, _) =>
      p(s).dimCameras.orderBy("camera_id")),

    "mars_dim_coordinate" -> ((s, _) =>
      p(s).dimCoordinate.orderBy("coordinate_id")),

    "mars_fact_photos" -> ((s, _) =>
      p(s).factPhotos.orderBy("image_id")),

    "mars_fact_path" -> ((s, _) =>
      p(s).factPath.orderBy("rover_id", "sol", "from_rmc")),

    "mars_validation_gaps" -> ((s, _) =>
      p(s).validationPhotoGaps.drop("validation_timestamp")
        .orderBy("rover_name", "sol")),

    "mars_photo_summary" -> ((s, _) =>
      p(s).photoSummary.orderBy("rover_name")),

    "mars_daily_activity" -> ((s, _) =>
      p(s).dailyActivity
        .orderBy("rover_name", "sol_number", "day_type", "travel_distance")),

    // taken_during_travel is cast to int (1/0/null) ONLY in this driver
    // projection: a nullable boolean round-trips through parquet/pandas as
    // None-vs-NaN and breaks the hash; ints null as NaN on both sides. The
    // library model (Marts.cameraTravelCorrelation) keeps the boolean.
    "mars_camera_travel_correlation" -> ((s, _) =>
      p(s).cameraTravelCorrelation
        .withColumn("taken_during_travel", col("taken_during_travel").cast("int"))
        .orderBy("image_link", "travel_time_start"))
  )

  val oracles: Map[String, String] = Map(
    "mars_flat_photos" ->
      s"""WITH $duckFlatPhotos
          SELECT * FROM flat_photos ORDER BY image_id""",

    "mars_flat_manifest" ->
      s"""WITH $duckFlatManifest
          SELECT rover_name, status, max_sol, max_date, total_photos,
                 launch_date, landing_date, ingestion_date
          FROM flat_manifest ORDER BY rover_name""",

    "mars_flat_manifest_photos" ->
      s"""WITH $duckFlatManifest, $duckFlatManifestPhotos
          SELECT * FROM flat_manifest_photos ORDER BY rover_name, sol""",

    "mars_flat_coordinates" ->
      s"""WITH $duckFlatCoordinates
          SELECT rover_name, sol, from_rmc, to_rmc, length, sclk_start,
                 sclk_end, ingestion_date
          FROM flat_coordinates ORDER BY rover_name, sol, from_rmc""",

    "mars_dim_rovers" ->
      s"""WITH $duckFlatManifest, $duckDimRovers
          SELECT * FROM dim_rovers ORDER BY rover_id""",

    "mars_dim_cameras" ->
      s"""WITH $duckFlatManifest, $duckDimCameras
          SELECT * FROM dim_cameras ORDER BY camera_id""",

    "mars_dim_coordinate" ->
      s"""WITH $duckFlatManifest, $duckFlatCoordinates, $duckDimRovers,
          exploded AS (
            SELECT rover_name, sol, from_rmc,
                   generate_subscripts(coordinates, 1) - 1 AS waypoint_sequence,
                   unnest(coordinates) AS coord
            FROM flat_coordinates),
          joined AS (
            SELECT d.rover_id, e.from_rmc, e.waypoint_sequence, e.sol, e.coord
            FROM exploded e JOIN dim_rovers d USING (rover_name))
          SELECT (CAST(rover_id AS BIGINT) * 1000000000 + sol * 1000 +
                  ROW_NUMBER() OVER (PARTITION BY rover_id, sol
                                     ORDER BY from_rmc, waypoint_sequence)) AS coordinate_id,
                 rover_id, waypoint_sequence, sol,
                 coord[1] AS longitude, coord[2] AS latitude, coord[3] AS elevation
          FROM joined ORDER BY coordinate_id""",

    "mars_fact_photos" ->
      s"""WITH $duckFlatPhotos, $duckFactPhotos
          SELECT * FROM fact_photos ORDER BY image_id""",

    "mars_fact_path" ->
      s"""WITH $duckFlatCoordinates, $duckFactPath
          SELECT * FROM fact_path ORDER BY rover_id, sol, from_rmc""",

    "mars_validation_gaps" ->
      s"""WITH $duckFlatPhotos, $duckFlatManifest, $duckFlatManifestPhotos,
          actual_sol_data AS (
            SELECT rover_name, earth_date, sol,
                   COUNT(DISTINCT camera_id) AS actual_camera_count,
                   COUNT(image_id) AS actual_total_photos
            FROM flat_photos GROUP BY rover_name, earth_date, sol)
          SELECT m.rover_name, m.sol, m.earth_date, m.manifest_total_photos,
                 coalesce(a.actual_total_photos, 0) AS actual_total_photos,
                 m.manifest_total_photos - coalesce(a.actual_total_photos, 0) AS photo_count_diff,
                 m.manifest_camera_count,
                 coalesce(a.actual_camera_count, 0) AS actual_camera_count,
                 m.manifest_camera_count - coalesce(a.actual_camera_count, 0) AS camera_count_diff,
                 CASE WHEN a.rover_name IS NULL THEN 'MISSING_SOL'
                      WHEN m.manifest_total_photos != coalesce(a.actual_total_photos, 0) THEN 'PHOTO_COUNT_MISMATCH'
                      WHEN m.manifest_camera_count != coalesce(a.actual_camera_count, 0) THEN 'CAMERA_COUNT_MISMATCH'
                      ELSE 'VALID' END AS validation_status
          FROM flat_manifest_photos m
          LEFT JOIN actual_sol_data a ON m.rover_name = a.rover_name AND m.sol = a.sol
          WHERE a.rover_name IS NULL
          ORDER BY m.rover_name, m.sol""",

    "mars_photo_summary" ->
      s"""WITH $duckFlatManifest, $duckDimRovers
          SELECT rover_name, status, launch_date, landing_date, max_sol,
                 max_date, total_photos, ingestion_date
          FROM dim_rovers ORDER BY rover_name""",

    "mars_daily_activity" ->
      s"""WITH $duckFlatPhotos, $duckFlatManifest, $duckFlatCoordinates,
          $duckDimRovers, $duckDimCameras, $duckFactPhotos, $duckFactPath
          SELECT dro.rover_name AS rover_name,
                 fph.sol AS sol_number,
                 coalesce(fpa.day_type, 'Stationary') AS day_type,
                 coalesce(fpa.length, 0) AS travel_distance,
                 CAST(SUM(CASE WHEN dca.camera_category = 'Engineering' THEN 1 ELSE 0 END) AS BIGINT) AS engineering_photo_count,
                 CAST(SUM(CASE WHEN dca.camera_category = 'Science' THEN 1 ELSE 0 END) AS BIGINT) AS science_photo_count,
                 CAST(SUM(CASE WHEN dca.camera_category = 'Entry, Descent, and Landing' THEN 1 ELSE 0 END) AS BIGINT) AS edl_photo_count,
                 MAX(fph.ingestion_date) AS ingestion_date
          FROM fact_photos fph
          LEFT JOIN dim_rovers dro ON fph.rover_id = dro.rover_id
          LEFT JOIN dim_cameras dca ON fph.rover_id = dca.rover_id AND fph.camera_name = dca.camera_name
          LEFT JOIN fact_path fpa ON fph.rover_id = fpa.rover_id AND fph.sol = fpa.sol
          WHERE fph.rover_id = 8
          GROUP BY dro.rover_name, fph.sol, fpa.day_type, fpa.length
          ORDER BY rover_name, sol_number, day_type, travel_distance""",

    "mars_camera_travel_correlation" ->
      s"""WITH $duckFlatPhotos, $duckFlatManifest, $duckFlatCoordinates,
          $duckDimRovers, $duckDimCameras, $duckFactPhotos, $duckFactPath,
          photo_with_time AS (
            SELECT rover_id, sol, camera_name, img_src,
                   CAST(nullif(regexp_extract(img_src, '_([0-9]{10})_', 1), '') AS BIGINT) AS photo_time,
                   ingestion_date
            FROM fact_photos WHERE rover_id = 8)
          SELECT dro.rover_name AS rover_name,
                 pwt.sol AS sol_number,
                 dca.camera_name AS camera_name,
                 fpa.sclk_start AS travel_time_start,
                 fpa.sclk_end AS travel_time_end,
                 pwt.img_src AS image_link,
                 pwt.photo_time AS photo_time,
                 CAST(pwt.photo_time BETWEEN fpa.sclk_start AND fpa.sclk_end AS INT) AS taken_during_travel,
                 pwt.ingestion_date AS ingestion_date
          FROM photo_with_time pwt
          JOIN dim_rovers dro ON pwt.rover_id = dro.rover_id
          JOIN dim_cameras dca ON pwt.rover_id = dca.rover_id AND pwt.camera_name = dca.camera_name
          JOIN fact_path fpa ON pwt.rover_id = fpa.rover_id AND pwt.sol = fpa.sol
          ORDER BY image_link, travel_time_start"""
  )
}
