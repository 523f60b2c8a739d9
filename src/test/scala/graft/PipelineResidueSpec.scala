package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.CurationPipeline
import graft.sim.VectorCurationPipeline

/** Checkpoint-residue bound for the curation pipelines (VERDICT r12 #7):
  * `Result.unpersist()` must ACTUALLY release every block a `run()`
  * stored — stage checkpoints and operator-internal persists alike — so
  * a long-lived session can run pipelines back to back without storage
  * accumulating. Two invocations each; after each unpersist the
  * persistent-RDD registry must return to its pre-run baseline. */
class PipelineResidueSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registryIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def awaitBaseline(baseline: Set[Int]): Set[Int] = {
    // unpersist(blocking = false) initiates removal; poll briefly
    var extra = registryIds -- baseline
    var waited = 0
    while (extra.nonEmpty && waited < 10000) {
      Thread.sleep(100); waited += 100; extra = registryIds -- baseline
    }
    extra
  }

  private def docCorpus = {
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    (1L to 60L).map { i =>
      val toks = (0 until 12).map(j => words(((i + j) % words.size).toInt))
      (i, toks.mkString(" ") + s" doc$i tail", if (i % 3 == 0) "s2" else "s1")
    }.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
  }

  test("text pipeline: unpersist returns storage to baseline, twice") {
    val docs = docCorpus
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val baseline = registryIds
    (1 to 2).foreach { i =>
      val r = CurationPipeline.run(corpus, bench)
      assert(r.audit.collect().nonEmpty)
      assert(r.blocks.nonEmpty,
        s"run $i should have tracked its persisted blocks")
      r.unpersist()
      val extra = awaitBaseline(baseline)
      assert(extra.isEmpty,
        s"run $i left persistent RDDs ${extra.mkString(",")} behind")
    }
  }

  test("vector pipeline: unpersist returns storage to baseline, twice") {
    val rnd = new scala.util.Random(7)
    val embs = (1L to 80L).map { i =>
      (i, Array.fill(8)(math.rint(rnd.nextDouble() * 100) / 100))
    }.toDF("vec_id", "embedding")
    val baseline = registryIds
    (1 to 2).foreach { i =>
      val r = VectorCurationPipeline.run(embs, col("vec_id") % 10 === 0)
      assert(r.audit.collect().nonEmpty)
      r.unpersist()
      val extra = awaitBaseline(baseline)
      assert(extra.isEmpty,
        s"run $i left persistent RDDs ${extra.mkString(",")} behind")
    }
  }
}
