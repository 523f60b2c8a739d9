package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Embeddings

class VecDotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("vec_dot is bit-identical to the portable HOF fold on real vectors") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), Embeddings.asDouble(col("embedding")).as("emb"))
    val pairs = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(500)
    val diff = pairs.select(
      Embeddings.dot(col("a.emb"), col("b.emb")).as("native"),
      Embeddings.dotPortable(col("a.emb"), col("b.emb")).as("portable"))
      .filter(col("native") =!= col("portable")) // bitwise: NaN-free data
      .count()
    assert(diff == 0)
  }

  test("null array yields null; length mismatch truncates like zip_with") {
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0))),
      (None, Some(Seq(1.0)))
    ).toDF("a", "b")
    val rows = df.select(Embeddings.dot(col("a"), col("b")).as("d")).collect()
    assert(rows(0).getDouble(0) == 1.0 * 4.0 + 2.0 * 5.0)
    assert(rows(1).isNullAt(0))
  }

  test("whole-stage codegen keeps vec_dot fused (no interpreted fallback marker)") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(Embeddings.asDouble(col("embedding")).as("emb"))
    val df = e.select(Embeddings.dot(col("emb"), col("emb")).as("d"))
    df.collect() // finalize the AQE plan so codegen stages materialize
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage;
    // the vec_dot projection must carry it (the HOF asDouble projection
    // next to it is CodegenFallback and won't — that contrast is the point)
    assert(plan.linesIterator.exists(l => l.contains("vec_dot") && l.contains("*(")), plan)
  }
}
