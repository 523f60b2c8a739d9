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
    // the r7 assign-pass knobs: exhaustive single-level + full-corpus
    // training at EVERY oracle sf (16 cells ≤ the 256-cell coarse floor;
    // n ≤ 32·cells up to sf0.01) — recorded oracle hashes unchanged
    for (n <- Seq(20L, 200L))
      assert(ScaleKnobs.kmeansSampleMod(n, ScaleKnobs.kmeansCells(n)) === 1,
        s"kmeansSampleMod($n)")
    assert(ScaleKnobs.kmeansCoarse(16) === 1)
    assert(ScaleKnobs.kmeansCoarse(256) === 1)
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
    // assign-pass knobs engage past the floors: sf1's 160 cells still
    // route single-level (< 256), sf10's 1600 go two-level at √1600=40,
    // and training leaves the corpus at sf0.1 (2000 > 32·16)
    assert(ScaleKnobs.kmeansCoarse(160) === 1)
    assert(ScaleKnobs.kmeansCoarse(1600) === 40)
    assert(ScaleKnobs.kmeansSampleMod(2000, 16) === 3)
    assert(ScaleKnobs.kmeansSampleMod(20000, 160) === 3)
    assert(ScaleKnobs.kmeansSampleMod(200000, 1600) === 3)
  }

  test("exact boundaries — integer arithmetic, no float log on the edge") {
    assert(ScaleKnobs.lshPlanes(1250L << 4) === 4)
    assert(ScaleKnobs.lshPlanes((1250L << 4) + 1) === 5)
    assert(ScaleKnobs.kmeansCells(16 * 125) === 16)
    assert(ScaleKnobs.kmeansCells(16 * 125 + 1) === 17)
    assert(ScaleKnobs.truthSampleMod(2099) === 20)
    assert(ScaleKnobs.truthSampleMod(2100) === 21)
    // integer sqrt at perfect-square boundaries (the exact places a
    // float sqrt can round either way) and the coarse floor edge
    assert(ScaleKnobs.kmeansCoarse(257) === 16)        // isqrt(257) = 16
    assert(ScaleKnobs.kmeansCoarse(289) === 17)        // 17² exactly
    assert(ScaleKnobs.kmeansCoarse(288) === 16)        // one below 17²
    // past the r8 three-level floor the mid count is icbrt²: icbrt(2^31)
    // = 1290 (1290³ ≤ Int.MaxValue < 1291³) — the bound the oracle's
    // generate_series(1, 1290) scan encodes
    assert(ScaleKnobs.kmeansCoarse(Int.MaxValue) === 1290 * 1290)
    assert(ScaleKnobs.kmeansSampleMod(16 * 32, 16) === 1)
    assert(ScaleKnobs.kmeansSampleMod(16 * 32 * 2, 16) === 2)
  }

  test("cells cap bounds the assign leg linearly (r8) — engagement + decades") {
    val cap = ScaleKnobs.KmeansCellsCap
    assert(cap === 1048576)
    // below engagement the cap is invisible — derivation unchanged from
    // r7 at every measured scale (incl. a hypothetical sf100 at 2M vecs)
    assert(ScaleKnobs.kmeansCells(2000000L) === 16000)
    assert(ScaleKnobs.kmeansCells(cap.toLong * 125) === cap)   // exactly at
    assert(ScaleKnobs.kmeansCells(cap.toLong * 125 + 1) === cap) // first clamp
    // a third decade past engagement: cells pinned, assign stays
    // N·3·∛cap ≈ N·303 (linear — three-level at the cap), occupancy
    // grows ∝ N (documented trade)
    assert(ScaleKnobs.kmeansCells(cap.toLong * 1250) === cap)
    assert(ScaleKnobs.kmeansCoarse(cap) === 101 * 101) // icbrt(2^20)² (3-level)
    // the cap subsumes the old Int.MaxValue clamp-before-narrow
    assert(ScaleKnobs.kmeansCells(Long.MaxValue / 2) === cap)
    // sample_mod keeps its own clamp (the SQL mirrors it with least())
    assert(ScaleKnobs.kmeansSampleMod(Long.MaxValue / 2, 16) === Int.MaxValue)
  }

  test("three-level routing engages past the floor (r8) — exact boundaries") {
    // at-or-below the floor: the recorded two-level plans are unchanged
    assert(ScaleKnobs.kmeansCoarse(4096) === 64)   // isqrt — sf10-class
    assert(ScaleKnobs.kmeansCoarse2(4096) === 1)
    assert(ScaleKnobs.kmeansCoarse(1600) === 40)   // the sf10 pin itself
    // first cell count past the floor: c1 = icbrt, mid = c1²
    assert(ScaleKnobs.kmeansCoarse2(4097) === 16)  // 16³ = 4096 ≤ 4097
    assert(ScaleKnobs.kmeansCoarse(4097) === 256)
    // perfect-cube boundaries (where a float cbrt can round either way)
    assert(ScaleKnobs.kmeansCoarse2(17576) === 26)  // 26³ exactly
    assert(ScaleKnobs.kmeansCoarse2(17575) === 25)  // one below 26³
    // the sf100emb decade: 16000 cells → c1 = 25, mid = 625; per-vector
    // assign = 25 + 625/25 + 16000/625 ≈ 76 vs two-level's 2·126 = 252
    assert(ScaleKnobs.kmeansCoarse2(16000) === 25)
    assert(ScaleKnobs.kmeansCoarse(16000) === 625)
    // at the cells cap: c1 = icbrt(2^20) = 101 (101³ = 1030301 ≤ 2^20)
    assert(ScaleKnobs.kmeansCoarse2(ScaleKnobs.KmeansCellsCap) === 101)
    assert(ScaleKnobs.kmeansCoarse(ScaleKnobs.KmeansCellsCap) === 101 * 101)
  }

  test("advise emits one row per knob with the operator formulas") {
    val rows = ScaleKnobs.advise(nDocs = 600, nVecs = 200).map {
      case (k, n, v, _) => (k, n, v)
    }
    assert(rows === Seq(
      ("hashed_knn_block_dims", 600L, 32L),
      ("kmeans_cells", 200L, 16L),
      ("kmeans_coarse", 200L, 1L),
      ("kmeans_coarse2", 200L, 1L),
      ("kmeans_sample_mod", 200L, 1L),
      ("nndescent_lsh_planes", 200L, 4L),
      ("semdedup_postings", 200L, 0L),
      ("nndescent_truth_mod", 200L, 20L)))
  }

  test("advise at decade-scale counts matches the hand-replayed oracle arithmetic") {
    // guards the constant-drift failure the r6 ADVICE named: the DuckDB
    // oracle SQL is generated from the SAME ScaleKnobs constants, and
    // this replays its arithmetic at counts where every floor is PASSED
    // (the sf0.01 gate alone can't catch a drifted constant because the
    // floors dominate there). nVecs = 200000 = the sf10 decade.
    val rows = ScaleKnobs.advise(nDocs = 600000, nVecs = 200000).map {
      case (k, _, v, _) => (k, v)
    }.toMap
    assert(rows("hashed_knn_block_dims") === (600000L + 63) / 64)  // 9375
    assert(rows("kmeans_cells") === (200000L + 124) / 125)         // 1600
    assert(rows("kmeans_coarse") === 40L)                          // isqrt(1600)
    assert(rows("kmeans_coarse2") === 1L)  // 1600 <= 4096: sf10 stays 2-level
    assert(rows("kmeans_sample_mod") === 200000L / (1600L * 32))   // 3
    assert(rows("nndescent_lsh_planes") === 8L)  // min g: 1250·2^g ≥ 200000
    assert(rows("nndescent_truth_mod") === 2000L)
    assert(rows("semdedup_postings") === 1L)  // 1600 cells > 256 floor
  }
}
