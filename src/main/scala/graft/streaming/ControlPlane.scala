package graft.streaming

import java.nio.file.{Files, Paths}
import java.util.UUID
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's three-topic Kafka control plane (SURVEY §2.10),
  * re-expressed for Structured Streaming.
  *
  * Topics carry small JSON coordination messages — never bulk data — so a
  * topic here is a durable append-only log of JSONL files consumed with
  * `readStream.schema(...).json(dir)`. That is the same source/sink shape
  * as `format("kafka")`; on a cluster with the Kafka connector only
  * `readTopic`/`produce` change (subscribe option + value column), which is
  * why the per-topic parse/build functions below take/return plain columns.
  */
object ControlPlane {

  val TopicMinioEvents = "minio-events"
  val TopicLoadComplete = "snowflake-load-complete"
  val TopicScheduling = "ingestion-scheduling"

  /** reference payload shapes (src/utils/kafka.py:9-24, snowflake.py:61-65,
    * snowflake.py:104-111). */
  val minioEventSchema: StructType = StructType(Seq(
    StructField("Key", StringType), StructField("EventName", StringType)))

  val loadCompleteSchema: StructType = StructType(Seq(
    StructField("tmp_jsonl_staging_path", StringType),
    StructField("status", StringType), StructField("timestamp", StringType)))

  val taskSchema: StructType = StructType(Seq(
    StructField("rover_name", StringType), StructField("sol", IntegerType)))

  val schedulingSchema: StructType = StructType(Seq(
    StructField("status", StringType), StructField("timestamp", StringType),
    StructField("ingestion_schedule", StructType(Seq(
      StructField("tasks", ArrayType(taskSchema)),
      StructField("sol_range", ArrayType(IntegerType)))))))

  def schemaFor(topic: String): StructType = topic match {
    case TopicMinioEvents => minioEventSchema
    case TopicLoadComplete => loadCompleteSchema
    case TopicScheduling => schedulingSchema
    case other => throw new IllegalArgumentException(s"unknown topic $other")
  }

  /** Per-topic field extraction from a raw JSON value column — the
    * Kafka-value-side of parse_kafka_message (kafka.py:5-24), including
    * the URL-decode of MinIO object keys (kafka.py:11, P14). */
  def parseValue(topic: String, value: Column): Column = {
    val parsed = from_json(value, schemaFor(topic))
    topic match {
      case TopicMinioEvents => url_decode(parsed.getField("Key"))
      case TopicLoadComplete => parsed.getField("tmp_jsonl_staging_path")
      case TopicScheduling => parsed.getField("ingestion_schedule")
      case _ => value // unknown topic → raw payload + warning, reference behavior
    }
  }

  /** Streaming source for one topic. */
  def readTopic(spark: SparkSession, root: String, topic: String): DataFrame = {
    Files.createDirectories(Paths.get(root, topic)) // source dir must pre-exist
    spark.readStream.schema(schemaFor(topic)).json(s"$root/$topic")
  }

  /** Batch view of a topic log (tests / catch-up reads). */
  def readTopicBatch(spark: SparkSession, root: String, topic: String): DataFrame =
    spark.read.schema(schemaFor(topic)).json(s"$root/$topic")

  /** Produce one message (one JSONL file = one log record; unique name =
    * append). flush-per-message like the reference producer (kafka.py:42-57). */
  def produce(root: String, topic: String, json: String): Unit = {
    val dir = Paths.get(root, topic)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(s"${System.nanoTime()}_${UUID.randomUUID()}.json"),
      json + "\n")
  }

  def minioEventJson(key: String): String =
    s"""{"Key":"$key","EventName":"s3:ObjectCreated:Put"}"""

  def loadCompleteJson(path: String, ts: String): String =
    s"""{"tmp_jsonl_staging_path":"$path","status":"success","timestamp":"$ts"}"""

  /** scheduleJson is GapScheduler.IngestionSchedule.toJson —
    * `{"ingestion_schedule":{...}}` — spliced into the full message. */
  def schedulingJson(scheduleJson: String, ts: String): String = {
    val body = scheduleJson.trim.stripPrefix("{").stripSuffix("}")
    s"""{"status":"success","timestamp":"$ts",$body}"""
  }
}
