package graft.ops

/** The corpus-derived scale knobs, in one place.
  *
  * PLANS.md's pair-operator chooser table carries the contract the
  * sf1→sf10 decade produced: every pair-generating operator's knob must
  * be DERIVED from the corpus (a count or cached stat), never a frozen
  * default — a documented "∝ log N" that no code computes is not a
  * bound (emb_nndescent shipped exactly that defect and OOM'd at sf10).
  * This object is the single source of truth for those derivations: the
  * operators call it, and the `td_scale_knobs` advisor query exposes the
  * same values as a row set, so "what knob would this corpus get?" is
  * answerable without running the operator.
  *
  * Every formula is EXACT INTEGER arithmetic (shifts and ceil-divisions,
  * no transcendental calls), for two reasons: the advisor's DuckDB
  * oracle must reproduce the values bit-exactly from the same counts,
  * and a float log2 at a power-of-two boundary can round either way
  * across libm implementations. Every formula floors at the operator's
  * declared default, so corpora at-or-below the oracle scales (sf0.001 /
  * sf0.01 / sf0.1) resolve to the historical constants and every
  * recorded oracle hash is unchanged.
  */
object ScaleKnobs {

  /** ceil(n / d) without floats. */
  private def ceilDiv(n: Long, d: Long): Long = (n + d - 1) / d

  /** Sign-LSH hyperplane count: the smallest p ≥ `floor` with
    * targetOccupancy · 2^p ≥ n, i.e. expected bucket occupancy held at
    * ~`targetOccupancy` as the corpus grows — Σ|bucket|² stays ~n·occ
    * (linear in n) instead of n²/2^floor.
    * Used by [[graft.sim.Embeddings.nnDescentRecall]]. */
  def lshPlanes(n: Long, floor: Int = 4, targetOccupancy: Long = 1250): Int = {
    // cap 49: targetOccupancy << 49 ≈ 7e17 already exceeds any corpus,
    // and both engines stay comfortably inside signed-64 (the DuckDB
    // mirror evaluates the shift for EVERY series value before
    // filtering, so the series bound must avoid overflow, not just the
    // returned value)
    var p = floor
    while (p < 49 && (targetOccupancy << p) < n) p += 1
    p
  }

  /** Brute-truth sampling modulus: cap the sampled query COUNT at
    * ~`maxQueries` instead of sampling a fixed fraction — a fixed
    * 1-in-`floor` fraction makes the exact leg |n/floor| × n, quadratic.
    * The estimate's variance changes with n; its expectation does not.
    * Used by [[graft.sim.Embeddings.nnDescentRecall]]. */
  def truthSampleMod(n: Long, floor: Int = 20, maxQueries: Long = 100): Int =
    // clamp before narrowing: at n beyond ~2e11 the Long result passes
    // Int.MaxValue and a bare .toInt would wrap NEGATIVE — the modulus
    // filter would then sample ~one row and silently report recall over
    // a single query. Clamped, the sample just grows past `maxQueries`.
    math.min(math.max(floor.toLong, n / maxQueries), Int.MaxValue.toLong).toInt

  /** Hashed-TF ANN blocking-projection width: blocks ≈ n/64 so candidate
    * pair work stays ~(n/blockDims)·n ≈ 64·n, linear; never below
    * 2·dims so the blocking projection is strictly finer than the
    * scoring one. Used by [[graft.text.TextOps.hashedKnn]]. */
  def blockDims(n: Long, dims: Int): Long =
    math.max(2L * dims, ceilDiv(n, 64L))

  /** k-means cell count: hold expected cell occupancy at
    * ~`targetOccupancy` (cells ∝ n), so SemDeDup's Σ|cell|² pair work
    * stays ~n·occ. The floor keeps oracle-scale corpora at the declared
    * 16 cells (sf0.1's 2000 vectors sit exactly at 16 × 125). Caveat the
    * chooser table documents: the ASSIGN pass costs n·cells per Lloyd
    * iteration, so at cluster scale one trains on a sample or caps cells
    * near √n and accepts n^1.5 pair work — occupancy-held is the right
    * dial up to the scales this library benches (1600 cells at sf10).
    * Used by the emb_semdedup / emb_kmeans_* registrations. */
  def kmeansCells(n: Long, floor: Int = 16, targetOccupancy: Long = 125): Int =
    // same clamp-before-narrow as truthSampleMod: a wrapped negative
    // cell count would poison kmeansTrain/semDedup without an error
    math.min(math.max(floor.toLong, ceilDiv(n, targetOccupancy)),
      Int.MaxValue.toLong).toInt

  /** The advisor rows behind the `td_scale_knobs` query: every derived
    * knob with its input count and the bound it holds. Pure function of
    * the two corpus counts so the DuckDB oracle replays it exactly. */
  def advise(nDocs: Long, nVecs: Long, hashedKnnDims: Int = 16)
      : Seq[(String, Long, Long, String)] = Seq(
    ("hashed_knn_block_dims", nDocs, blockDims(nDocs, hashedKnnDims),
      "candidate pair work ~64*N (blocks ~ N/64)"),
    ("kmeans_cells", nVecs, kmeansCells(nVecs).toLong,
      "semdedup pair work ~125*N (cell occupancy ~125)"),
    ("nndescent_lsh_planes", nVecs, lshPlanes(nVecs).toLong,
      "seed pair work ~1250*N (bucket occupancy ~1250)"),
    ("nndescent_truth_mod", nVecs, truthSampleMod(nVecs).toLong,
      "exact-truth leg ~100*N (sampled queries capped ~100)"))
}
