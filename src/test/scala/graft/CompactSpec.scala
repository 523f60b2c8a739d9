package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Compact

class CompactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("compaction shrinks file count, preserves data, restores sort layout") {
    import spark.implicits._
    val dir = Files.createTempDirectory("compact").toString + "/t"
    // simulate a streaming sink: 40 appends of a few rows each
    (1 to 40).foreach { i =>
      Seq((i.toLong, s"v$i", i % 5)).toDF("id", "payload", "k")
        .write.mode("append").parquet(dir)
    }
    val beforeData = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    val stats = Compact.compact(spark, dir, targetBytes = 1L << 30, sortCols = Seq("k", "id"))
    assert(stats.filesBefore >= 40 && stats.filesAfter == 1,
      s"expected 40+ -> 1 files, got $stats")
    assert(stats.rows == 40)
    val after = spark.read.parquet(dir)
    assert(after.collect().map(_.toSeq).toSet == beforeData)
    // within-file ordering restored for min/max pruning
    val ks = after.select("k").collect().map(_.getInt(0)).toSeq
    assert(ks == ks.sorted)
  }
}
