package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ScaleKnobs

/** Pins the corpus-derived knob formulas (the chooser-table contract:
  * knobs must MOVE with N, and must NOT move below the oracle scales).
  * Pure arithmetic — no SparkSession. */
class ScaleKnobsSpec extends AnyFunSuite {

  test("floors hold at every oracle scale — historical constants unchanged") {
    // embeddings: sf0.001=20, sf0.01=200, sf0.1=2000
    for (n <- Seq(20L, 200L, 2000L)) {
      assert(ScaleKnobs.lshPlanes(n) === 4, s"lshPlanes($n)")
      assert(ScaleKnobs.kmeansCells(n) === 16, s"kmeansCells($n)")
      assert(ScaleKnobs.truthSampleMod(n) === 20, s"truthSampleMod($n)")
    }
    // documents: sf0.001=60, sf0.01=600 (sf0.1's 6000 already moves — the
    // r5 blockDims formula predates ScaleKnobs and is unchanged by it)
    assert(ScaleKnobs.blockDims(60, dims = 16) === 32)
    assert(ScaleKnobs.blockDims(600, dims = 16) === 32)
    assert(ScaleKnobs.blockDims(6000, dims = 16) === 94)
  }

  test("knobs move across the measured decades (sf1 / sf10 corpus counts)") {
    // sf1: 20k vectors sit exactly at 1250·2^4 — the floor's last stop
    assert(ScaleKnobs.lshPlanes(20000) === 4)
    assert(ScaleKnobs.lshPlanes(200000) === 8) // sf10: occupancy ~780
    assert(ScaleKnobs.kmeansCells(20000) === 160)
    assert(ScaleKnobs.kmeansCells(200000) === 1600)
    assert(ScaleKnobs.truthSampleMod(20000) === 200) // ~100 queries
    assert(ScaleKnobs.truthSampleMod(200000) === 2000)
    assert(ScaleKnobs.blockDims(60000, dims = 16) === 938) // pair work ~64·N
    assert(ScaleKnobs.blockDims(600000, dims = 16) === 9375)
  }

  test("exact boundaries — integer arithmetic, no float log on the edge") {
    assert(ScaleKnobs.lshPlanes(1250L << 4) === 4)
    assert(ScaleKnobs.lshPlanes((1250L << 4) + 1) === 5)
    assert(ScaleKnobs.kmeansCells(16 * 125) === 16)
    assert(ScaleKnobs.kmeansCells(16 * 125 + 1) === 17)
    assert(ScaleKnobs.truthSampleMod(2099) === 20)
    assert(ScaleKnobs.truthSampleMod(2100) === 21)
  }

  test("advise emits one row per knob with the operator formulas") {
    val rows = ScaleKnobs.advise(nDocs = 600, nVecs = 200).map {
      case (k, n, v, _) => (k, n, v)
    }
    assert(rows === Seq(
      ("hashed_knn_block_dims", 600L, 32L),
      ("kmeans_cells", 200L, 16L),
      ("nndescent_lsh_planes", 200L, 4L),
      ("nndescent_truth_mod", 200L, 20L)))
  }
}
