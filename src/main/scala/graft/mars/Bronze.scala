package graft.mars

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bronze loaders: schema-on-read JSON → typed DataFrames.
  *
  * Mirrors the reference's COPY INTO bronze step (src/utils/snowflake.py:24-65):
  * PERMISSIVE mode reproduces ON_ERROR='CONTINUE' (bad records → null row,
  * never a failed load), and Spark's default case-insensitive field
  * resolution reproduces MATCH_BY_COLUMN_NAME=CASE_INSENSITIVE.
  *
  * Error→empty-relation semantics (reference: src/ingestion/photos.py:19-21 —
  * any source failure yields an empty payload, never an exception) are in
  * `orEmpty`: a missing path returns a correctly-typed empty DataFrame.
  *
  * At 100 TB these reads are the parquet/JSON scans of a partitioned lake
  * directory; the per-file JSONL-restaging step of the reference
  * (src/utils/minio.py:48-67) has no Spark equivalent and is dropped
  * (SURVEY §2.1 S8: spark.read.json handles both layouts).
  */
object Bronze {

  private def read(spark: SparkSession, path: String,
                   schema: org.apache.spark.sql.types.StructType): DataFrame =
    orEmpty(spark, schema) {
      spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)
    }

  /** Source failure → typed empty relation, never an exception
    * (reference: photos.py:19-21, manifest.py:19-21, coordinates.py:24-26). */
  def orEmpty(spark: SparkSession, schema: org.apache.spark.sql.types.StructType)
             (load: => DataFrame): DataFrame =
    try {
      val df = load
      df.queryExecution.analyzed // force analysis so missing paths surface here
      df
    } catch {
      case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /** A PERMISSIVE load that CAPTURES its rejects instead of nulling them
    * away: malformed lines land in Spark's corrupt-record column, and the
    * result is split into a clean typed frame plus an auditable rejects
    * frame holding the raw offending text — the badRecordsPath /
    * ON_ERROR='CONTINUE'-with-reject-table pattern. At 100 TB silent null
    * rows from a upstream format drift are how corpora rot; a quarantine
    * makes the drift measurable (count) and replayable (raw lines kept).
    *
    * The parsed frame is cached once: Spark refuses plans that filter on
    * ONLY the internal corrupt column over a streaming re-parse, and the
    * cache also guarantees good/bad split from the SAME parse. Call
    * [[Quarantined.release]] when both sides are consumed. */
  final case class Quarantined(good: DataFrame, bad: DataFrame,
                               private val parsed: DataFrame) {
    def release(): Unit = { parsed.unpersist(); () }
  }

  def readQuarantined(spark: SparkSession, path: String,
                      schema: org.apache.spark.sql.types.StructType): Quarantined = {
    import org.apache.spark.sql.functions.col
    val corrupt = "_corrupt_record"
    val withCol = schema.add(corrupt, org.apache.spark.sql.types.StringType)
    val parsed = orEmpty(spark, withCol) {
      spark.read.schema(withCol)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
        .json(path)
    }.cache()
    Quarantined(
      good = parsed.filter(col(corrupt).isNull).drop(corrupt),
      bad = parsed.filter(col(corrupt).isNotNull)
        .select(col(corrupt).as("raw_record")),
      parsed = parsed)
  }

  /** RAW_PHOTO_RESPONSE (reference: models/staging/sources.yml bronze). */
  def rawPhotoResponse(spark: SparkSession, path: String): DataFrame =
    read(spark, path, Schemas.photoBatch)

  /** RAW_MANIFEST_RESPONSE. */
  def rawManifestResponse(spark: SparkSession, path: String): DataFrame =
    read(spark, path, Schemas.manifestBatch)

  /** RAW_COORDINATE_RESPONSE. */
  def rawCoordinateResponse(spark: SparkSession, path: String): DataFrame =
    read(spark, path, Schemas.coordinateBatch)
}
