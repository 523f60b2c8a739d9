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

  /** The default constants behind every derivation, NAMED so the
    * `td_scale_knobs` DuckDB oracle SQL is GENERATED from the same
    * values (TrainingOps.duckScaleKnobsSql interpolates these) — a
    * change to any default flows into both engines at once instead of
    * silently diverging from a hardcoded SQL constant. */
  val LshFloor = 4
  val LshCap = 49
  val LshOccupancy = 1250L
  val TruthFloor = 20
  val TruthMaxQueries = 100L
  val BlockOccupancy = 64L
  val HashedKnnDims = 16
  val KmeansFloor = 16
  val KmeansOccupancy = 125L
  val CoarseFloorCells = 256
  val SamplePerCell = 32L

  /** Cap on [[kmeansCells]] (2^20). Occupancy-held cells (∝ N) make the
    * one full two-level assign pass N·2·√cells ∝ N^1.5 — the r7
    * residual. The cap converts it to a LINEAR bound past the
    * engagement point N > cap·occupancy (≈131M vectors): assign ≤
    * N·2·√cap = N·2048 forever. The traded consequence is occupancy:
    * past engagement, occupancy grows ∝ N and SemDeDup's within-cell
    * pair work Σ|cell|² ≈ N·(N/cap) leaves the ~125·N class — the
    * quadratic pressure moves from the assign (paid by every Lloyd
    * iteration plus the final pass) to the ONE semdedup pair pass,
    * where it engages ~60× later than the old assign did and where
    * raising the cap is the relief valve. The OTHER relief valve is
    * implemented (r8): past [[ThreeLevelFloorCells]] the assign routes
    * THREE-level (N·3·∛cells — see [[kmeansCoarse2]]), so even before
    * the cap the growth class is N^(4/3), not N^1.5, and occupancy
    * (SemDeDup's ~125·N bound) is untouched. Every measured sf sits
    * far below cap engagement, so the cap changes no recorded hash or
    * plan. */
  val KmeansCellsCap = 1 << 20

  /** Cells threshold where the assign pass adds its THIRD routing level
    * (r8): below it two-level (N·2·√cells) wins on routing-error and
    * setup grounds; above it N·3·∛cells is strictly less work (at the
    * floor: 2·√4096 = 128 vs 3·∛4096 = 48). 4096 keeps sf10's 1600
    * cells on the recorded two-level plan — the BENCH_SF10 rows stay
    * valid — while sf100emb's 16000 cells engage the new level. */
  val ThreeLevelFloorCells = 4096

  /** ceil(n / d) without floats. */
  private def ceilDiv(n: Long, d: Long): Long = (n + d - 1) / d

  /** Integer sqrt: the largest s ≥ 0 with s·s ≤ n. Plain descent from a
    * float seed with exact integer verification — the float is only a
    * starting point, the returned value is integer-checked, so the
    * result is identical on every platform (no libm boundary rounding). */
  private[graft] def isqrt(n: Long): Long = {
    if (n <= 0) 0L
    else {
      // seed capped at isqrt(Long.MaxValue) so s*s never overflows
      var s = math.min(3037000499L, math.max(1L, math.sqrt(n.toDouble).toLong + 1L))
      while (s * s > n) s -= 1
      s
    }
  }

  /** Integer cube root: the largest s ≥ 0 with s·s·s ≤ n. Same
    * float-seed + exact-integer-descent posture as [[isqrt]]. */
  private[graft] def icbrt(n: Long): Long = {
    if (n <= 0) 0L
    else {
      // seed capped at icbrt(Long.MaxValue) so s*s*s never overflows
      var s = math.min(2097151L, math.max(1L, math.cbrt(n.toDouble).toLong + 1L))
      while (s * s * s > n) s -= 1
      s
    }
  }

  /** Sign-LSH hyperplane count: the smallest p ≥ `floor` with
    * targetOccupancy · 2^p ≥ n, i.e. expected bucket occupancy held at
    * ~`targetOccupancy` as the corpus grows — Σ|bucket|² stays ~n·occ
    * (linear in n) instead of n²/2^floor.
    * Used by [[graft.sim.Embeddings.nnDescentRecall]]. */
  def lshPlanes(n: Long, floor: Int = LshFloor,
                targetOccupancy: Long = LshOccupancy): Int = {
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
  def truthSampleMod(n: Long, floor: Int = TruthFloor,
                     maxQueries: Long = TruthMaxQueries): Int =
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
    math.max(2L * dims, ceilDiv(n, BlockOccupancy))

  /** k-means cell count: hold expected cell occupancy at
    * ~`targetOccupancy` (cells ∝ n), so SemDeDup's Σ|cell|² pair work
    * stays ~n·occ. The floor keeps oracle-scale corpora at the declared
    * 16 cells (sf0.1's 2000 vectors sit exactly at 16 × 125). The assign
    * pass that occupancy-held cells would make n·cells per Lloyd
    * iteration (quadratic-class — the r6 decade's one named scale
    * killer) is bounded by the two companion knobs: [[kmeansCoarse]]
    * (two-level routing, n·2·√cells) and [[kmeansSampleMod]] (Lloyd
    * iterations on a ∝ cells sample; one full assign pass total).
    * Used by the emb_semdedup / emb_kmeans_* registrations. */
  def kmeansCells(n: Long, floor: Int = KmeansFloor,
                  targetOccupancy: Long = KmeansOccupancy,
                  cap: Int = KmeansCellsCap): Int =
    // the cap (subsuming the old Int.MaxValue clamp-before-narrow)
    // bounds the assign pass linearly — see [[KmeansCellsCap]] for the
    // occupancy trade it buys that with
    math.min(math.max(floor.toLong, ceilDiv(n, targetOccupancy)),
      cap.toLong).toInt

  /** Coarse-quantizer group count for the two-level k-means ASSIGN pass
    * (the bound on the one quadratic-class path the r6 decade named):
    * with occupancy-held cells (cells ∝ n) an exhaustive assign is
    * n·cells per Lloyd iteration; routing every vector through
    * ~isqrt(cells) coarse centroids first, then scanning only the
    * winning group's ~cells/isqrt(cells) member cells, makes the assign
    * n·2·√cells — the n^1.5-class posture IVF builders use. Returns 1
    * (= exhaustive, BIT-IDENTICAL to the historical single-level plan)
    * while cells ≤ `floorCells`, which covers every oracle sf and sf0.1
    * (16 cells) — so every recorded oracle hash is unchanged and the
    * two-level approximation only engages where the bound matters.
    * Used by [[graft.sim.Embeddings.assignToCells]] via the
    * emb_kmeans_train / emb_kmeans_quality / emb_semdedup
    * registrations. */
  def kmeansCoarse(cells: Int, floorCells: Int = CoarseFloorCells,
                   threeLevelFloor: Int = ThreeLevelFloorCells): Int =
    if (cells <= floorCells) 1
    else if (cells <= threeLevelFloor) isqrt(cells.toLong).toInt
    else {
      // three-level regime (r8): this is the MID level count c2 = c1²
      // (≈ cells^(2/3)), with [[kmeansCoarse2]] supplying c1 = ∛cells —
      // per-vector assign work c1 + c2/c1 + cells/c2 ≈ 3·∛cells
      val c1 = icbrt(cells.toLong)
      (c1 * c1).toInt
    }

  /** The TOP routing level count for the three-level assign (r8): 1
    * (= two-level or exhaustive, exactly the r7 plans) while cells ≤
    * `threeLevelFloor`, else ∛cells — the L1 group count over
    * [[kmeansCoarse]]'s c2 mid-level groups. Engaging the third level
    * keeps cell occupancy (and so SemDeDup's ~125·N pair bound)
    * untouched while the assign drops from N·2·√cells to N·3·∛cells:
    * at sf100emb's 16000 cells that is 76 vs 252 scored centroids per
    * vector. Used by [[graft.sim.Embeddings.assignToCells]]. */
  def kmeansCoarse2(cells: Int,
                    threeLevelFloor: Int = ThreeLevelFloorCells): Int =
    if (cells <= threeLevelFloor) 1 else icbrt(cells.toLong).toInt

  /** Engage SemDeDup's cell-bucketed-postings plan (r9) past the same
    * cell floor that engages two-level assign routing: at-or-below the
    * floor (every oracle sf resolves to 16 cells) the historical
    * exact-pair plan runs unchanged — recorded hashes and plan tags
    * untouched — while larger corpora persist the scored frame
    * bucketed+sorted by cell once and run the rank window and the
    * within-cell pair join with ZERO Exchange nodes
    * ([[graft.sim.Embeddings.semDedupBucketed]]). Chosen over the int8
    * pre-verify variant by the r9 FORCED-evaluation A/B at sf100emb
    * (bucketed 62 s / classic 68 s / quantized 87–101 s, identical
    * outputs): the pair pass is compute-bound at fixed local resources
    * and a quantized estimate of the same dimension cannot cut its CPU,
    * while removing the exchange entirely wins on every measured
    * profile. The quantized path (semDedup(quantPre=true), 6× fewer
    * exchange bytes) remains the documented alternative for
    * network-bound deployments — PLANS.md carries the full trail. */
  def semDedupPostings(cells: Int, floorCells: Int = CoarseFloorCells): Boolean =
    cells > floorCells

  /** Centroid-training sample modulus: Lloyd ITERATIONS run on the
    * ~cells·`perCell` deterministic hash-sample (vec_id ≡ 0 mod the
    * returned value) — sample size ∝ cells, so per-iteration assign
    * work is (cells·perCell)·√cells under the two-level assign — and
    * only the final single assign pass touches the full corpus. Returns
    * 1 (= train on everything, bit-identical to the historical loop)
    * whenever n ≤ cells·perCell, which covers every oracle sf.
    * Used by [[graft.sim.Embeddings.kmeansTrainSampled]]. */
  def kmeansSampleMod(n: Long, cells: Int, perCell: Long = SamplePerCell): Int =
    math.min(math.max(1L, n / (cells.toLong * perCell)),
      Int.MaxValue.toLong).toInt

  /** The advisor rows behind the `td_scale_knobs` query: every derived
    * knob with its input count and the bound it holds. Pure function of
    * the two corpus counts so the DuckDB oracle replays it exactly. */
  def advise(nDocs: Long, nVecs: Long, hashedKnnDims: Int = HashedKnnDims)
      : Seq[(String, Long, Long, String)] = Seq(
    ("hashed_knn_block_dims", nDocs, blockDims(nDocs, hashedKnnDims),
      "candidate pair work ~64*N (blocks ~ N/64)"),
    ("kmeans_cells", nVecs, kmeansCells(nVecs).toLong,
      s"semdedup pair work ~125*N (cell occupancy ~125; $KmeansCellsCap-cell cap bounds assign <= 2048*N)"),
    ("kmeans_coarse", nVecs, kmeansCoarse(kmeansCells(nVecs)).toLong,
      s"lloyd assign mid routing level (sqrt(cells) two-level; cbrt(cells)^2 past $ThreeLevelFloorCells cells)"),
    ("kmeans_coarse2", nVecs, kmeansCoarse2(kmeansCells(nVecs)).toLong,
      s"lloyd assign top routing level (cbrt(cells) past $ThreeLevelFloorCells cells => assign ~3*cbrt(cells)*N)"),
    ("kmeans_sample_mod", nVecs,
      kmeansSampleMod(nVecs, kmeansCells(nVecs)).toLong,
      "centroid training on a ~32*cells sample (iterations off-corpus)"),
    ("nndescent_lsh_planes", nVecs, lshPlanes(nVecs).toLong,
      "seed pair work ~1250*N (bucket occupancy ~1250)"),
    ("semdedup_postings", nVecs,
      if (semDedupPostings(kmeansCells(nVecs))) 1L else 0L,
      s"cell-bucketed postings (zero-Exchange rank+pair plan) past $CoarseFloorCells cells"),
    ("nndescent_truth_mod", nVecs, truthSampleMod(nVecs).toLong,
      "exact-truth leg ~100*N (sampled queries capped ~100)"))
}
