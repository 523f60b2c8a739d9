package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.mars.Bronze

/** [[Bronze.readQuarantined]] — PERMISSIVE ingestion that keeps its
  * rejects auditable instead of nulling them away.
  */
class QuarantineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("malformed lines split into a raw quarantine; good rows stay typed") {
    val dir = Files.createTempDirectory("quarantine").toString
    Files.writeString(Paths.get(dir, "batch.json"),
      """{"id": 1, "name": "ok-one"}
        |{"id": broken not json
        |{"id": 2, "name": "ok-two"}
        |[1,2,[
        |""".stripMargin)
    val q = Bronze.readQuarantined(spark, dir, schema)
    try {
      val good = q.good.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(good === Set((1L, "ok-one"), (2L, "ok-two")))
      val bad = q.bad.collect().map(_.getString(0)).toSet
      assert(bad === Set("{\"id\": broken not json", "[1,2,["))
    } finally q.release()
  }

  test("a schema-conforming line with missing fields is GOOD (permissive), not quarantined") {
    val dir = Files.createTempDirectory("quarantine").toString
    Files.writeString(Paths.get(dir, "batch.json"),
      """{"id": 5}
        |{"name": "only-name"}
        |""".stripMargin)
    val q = Bronze.readQuarantined(spark, dir, schema)
    try {
      assert(q.bad.count() === 0)
      assert(q.good.count() === 2)
    } finally q.release()
  }

  test("a missing path yields empty good AND empty bad, never an exception") {
    val q = Bronze.readQuarantined(spark, "/nonexistent/bronze/path", schema)
    try {
      assert(q.good.count() === 0)
      assert(q.bad.count() === 0)
      assert(q.good.schema.fieldNames.toSeq === Seq("id", "name"))
    } finally q.release()
  }
}
