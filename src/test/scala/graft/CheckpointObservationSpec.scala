package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the mechanism CurationPipeline's fused audit counts (r13) rely
  * on: Dataset.observe metrics ARE collected by the eager localCheckpoint
  * materialization action (it goes through withAction, so the
  * QueryExecutionListener fires), including under the serialized
  * Checkpoints.ser level, and the checkpointed frame stays fully usable.
  * If a Spark upgrade ever stops checkpoint actions from firing
  * observations, these tests hang/fail rather than the pipeline silently
  * blocking. */
class CheckpointObservationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("observation fires on eager localCheckpoint") {
    val obs = Observation("probe")
    val df = (1 to 100).toDF("x")
      .observe(obs, count(lit(1)).as("n"), sum(when(col("x") > 50, 1L).otherwise(0L)).as("hi"))
      .localCheckpoint()
    // if checkpoint doesn't fire the listener, this hangs
    val m = obs.getAsJava
    assert(m.get("n") == 100L, s"got $m")
    assert(m.get("hi") == 50L, s"got $m")
    // checkpointed frame still fully usable
    assert(df.count() == 100L)
  }

  test("observation fires on serialized eager localCheckpoint helper") {
    val obs = Observation("probe2")
    val df = (1 to 10).toDF("x").observe(obs, count(lit(1)).as("n"))
    val ck = graft.ops.Checkpoints.ser(df)
    assert(obs.getAsJava.get("n") == 10L)
    assert(ck.count() == 10L)
  }
}
