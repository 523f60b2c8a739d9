package graft.mars

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimension views (SURVEY §2: P5, P7, A3, W1, W2, J1, G4, G5). */
object Dims {

  /** reference: models/staging/dim_rovers.sql — rover_id CASE + manifest
    * columns. One row per rover because flat_manifest_response merges on
    * rover_name (SURVEY header note). */
  def dimRovers(flatManifest: DataFrame): DataFrame =
    flatManifest.select(
      RoverKeys.roverId(col("rover_name")).as("rover_id"),
      col("rover_name"), col("status"), col("launch_date"), col("landing_date"),
      col("max_sol"), col("max_date"), col("total_photos"), col("ingestion_date"))

  /** reference: models/staging/dim_cameras.sql — double flatten
    * (manifests → per-sol → per-camera, G4), dedup via GROUP BY (A3),
    * category bucketing (P7), global ROW_NUMBER surrogate key (W1).
    *
    * The unpartitioned window is a deliberate single-partition step over
    * the *deduped* camera set (~tens of rows at any scale — camera
    * hardware, not data volume), so it is safe even at 100 TB: the heavy
    * explode+distinct before it is fully parallel.
    */
  def dimCameras(flatManifest: DataFrame): DataFrame = {
    val cameras = flatManifest
      .select(col("rover_name"), explode(col("photos")).as("sol_stat"))
      .select(col("rover_name"), explode(col("sol_stat.cameras")).as("camera_name"))
      .select(
        col("rover_name"),
        col("camera_name"),
        RoverKeys.cameraCategory(col("camera_name")).as("camera_category"))
      .distinct()
    cameras
      .select(
        RoverKeys.roverId(col("rover_name")).as("rover_id"),
        col("camera_name"), col("camera_category"))
      // Unpartitioned window = one-partition sort, deliberate: a dense
      // surrogate key needs a global order, and this dimension is bounded
      // by physical camera hardware per rover (tens of rows at ANY corpus
      // scale — fact growth never widens a rover's camera list). Spark's
      // WindowExec warning about it is expected; never do this on a fact.
      .withColumn("camera_id",
        row_number().over(Window.orderBy(col("camera_name"), col("rover_id"))))
      .select(col("rover_id"), col("camera_name"), col("camera_id"), col("camera_category"))
  }

  /** reference: models/staging/dim_coordinate.sql — ordinal flatten of the
    * waypoint array (G5: FLATTEN index → posexplode), rover join (J1,
    * broadcast: dim side is ≤4 rows), arithmetic composite key over a
    * partitioned ROW_NUMBER (W2).
    */
  def dimCoordinate(flatCoordinates: DataFrame, dimRovers: DataFrame): DataFrame = {
    val exploded = flatCoordinates
      .select(
        col("rover_name"), col("sol"), col("from_rmc"),
        posexplode(col("coordinates")).as(Seq("waypoint_sequence", "coord")))
      .join(broadcast(dimRovers.select("rover_id", "rover_name")), Seq("rover_name"))
    // The reference orders only by coord.index (dim_coordinate.sql:8), which
    // ties when a sol has multiple drive segments — nondeterministic key
    // assignment (SURVEY §7.4.4). We pin determinism by ordering segments by
    // from_rmc first, then waypoint index within each segment.
    val w = Window.partitionBy(col("rover_id"), col("sol"))
      .orderBy(col("from_rmc"), col("waypoint_sequence"))
    exploded
      .select(
        (col("rover_id").cast("long") * 1000000000L + col("sol").cast("long") * 1000L).as("key_base"),
        col("rover_id"), col("from_rmc"), col("waypoint_sequence"), col("sol"),
        col("coord").getItem(0).as("longitude"),
        col("coord").getItem(1).as("latitude"),
        col("coord").getItem(2).as("elevation"))
      .withColumn("coordinate_id", col("key_base") + row_number().over(w))
      .select(col("coordinate_id"), col("rover_id"), col("waypoint_sequence"),
        col("sol"), col("longitude"), col("latitude"), col("elevation"))
  }
}
