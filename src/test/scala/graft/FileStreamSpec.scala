package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The FILE streaming source — the landing-zone ingestion shape (S7/S9's
  * streaming face): files drop into a directory, the stream discovers
  * and processes exactly the new ones per run, offsets (the seen-file
  * log) live in the checkpoint. `maxFilesPerTrigger` is the batch-size
  * throttle that keeps a backlog drain from planning one giant batch.
  */
class FileStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("file source to file sink: exactly-once across AvailableNow runs") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("fs_in").toString
    val out = java.nio.file.Files.createTempDirectory("fs_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("fs_ckpt").toString
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("payload", StringType)))
    def drop(rows: (Long, String)*): Unit =
      rows.toDF("id", "payload").coalesce(1).write.mode("append").parquet(in)
    def runOnce(): Seq[Long] = {
      // parquet sink: the fault-tolerant pair of the file source — the
      // output commit log plus the seen-file log make file→file
      // exactly-once (memory sink can't recover an append checkpoint)
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000))
      spark.read.parquet(out).collect().map(_.getAs[Long]("id")).toSeq.sorted
    }
    try {
      drop(1L -> "a", 2L -> "b")
      assert(runOnce() == Seq(1L, 2L))
      drop(3L -> "c")
      // run 2 processed ONLY the new file: had files 1-2 been re-read,
      // their ids would now appear twice in the append-only sink
      assert(runOnce() == Seq(1L, 2L, 3L))
    } finally {
      import scala.reflect.io.Directory
      Seq(in, out, ckpt).foreach(d =>
        new Directory(new java.io.File(d)).deleteRecursively())
    }
  }

  test("rank-filter pattern plans a WindowGroupLimit (top-k pushdown)") {
    // not a streaming concern, but the same "bounded work" family: Spark
    // prunes each partition's candidates to k BEFORE the full window sort
    val df = Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rk") <= 3)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }
}
