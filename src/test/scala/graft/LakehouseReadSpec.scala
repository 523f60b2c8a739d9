package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lakehouse read-surface contracts an evolving 100 TB dataset depends on:
  *
  *  - SCHEMA EVOLUTION: bronze appends gain columns over time (the
  *    reference's MATCH_BY_COLUMN_NAME COPY tolerates exactly this);
  *    `mergeSchema` unions the per-file schemas and back-fills nulls, so
  *    old files stay readable forever.
  *  - FILE LINEAGE: `_metadata` exposes which physical file produced each
  *    row — the debugging handle when one of ~100k input splits is bad
  *    (skip/quarantine by file, not by re-running the pipeline).
  */
class LakehouseReadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("mergeSchema reads files written before a column existed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    try {
      Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
        .write.mode("append").parquet(dir)
      Seq((3L, "c", "en")).toDF("id", "payload", "lang")
        .write.mode("append").parquet(dir)
      val df = spark.read.option("mergeSchema", "true").parquet(dir)
      assert(df.columns.toSet == Set("id", "payload", "lang"))
      val rows = df.orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
      assert(rows.toSeq == Seq((1L, "a", None), (2L, "b", None),
        (3L, "c", Some("en"))))
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("CSV, JSON and ORC round-trip with explicit schemas") {
    // the reference ships JSON only (§2.1); the engine covers every
    // columnar/text format Spark serves natively. Explicit schemas on
    // read: schema inference is a full extra pass at 100 TB.
    import spark.implicits._
    val df = Seq((1L, "a,b\"c", 1.5), (2L, null.asInstanceOf[String], -0.25))
      .toDF("id", "s", "v")
    val expect = df.collect().map(_.toSeq).toSet
    for (fmt <- Seq("csv", "json", "orc")) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_$fmt").toString
      try {
        val w = df.write.mode("overwrite")
        (if (fmt == "csv") w.option("header", "true") else w).format(fmt).save(dir)
        val r = spark.read.schema(df.schema)
        val back = (if (fmt == "csv") r.option("header", "true") else r)
          .format(fmt).load(dir)
        assert(back.collect().map(_.toSeq).toSet == expect,
          s"$fmt round-trip drifted")
      } finally {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(dir)).deleteRecursively()
      }
    }
  }

  test("_metadata columns attribute every row to its source file") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("_metadata.file_name").as("f"),
        col("_metadata.file_size").as("sz"))
    val r = li.groupBy("f").agg(count(lit(1)).as("n"), max("sz").as("sz"))
      .collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[String]("f").endsWith(".parquet")))
    assert(r.forall(_.getAs[Long]("sz") > 0L))
  }
}
