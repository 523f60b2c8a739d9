package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Embeddings
import graft.streaming.SemDedupIngest

/** [[SemDedupIngest]] — semantic near-dup ADMISSION over a vector
  * stream (r9): earliest arrival wins within a batch and against the
  * store, the cell is the blocking, and replays re-derive every
  * decision to the identical admitted set (exactly-once by idempotence,
  * the VectorIngest posture — no marker, so the convergence proof IS
  * the decision determinism).
  */
class SemDedupIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 4 orthogonal unit clusters seed the index (one vector each, the
    * basis vectors), so routing is exact and within-cell cosines are
    * either 1.0 (same direction) or < 1 by a controlled tilt. */
  private def freshIndex(): String = {
    val dir = Files.createTempDirectory("semdedup_ingest").toString + "/ivf"
    val seed = (0L until 4L).map { c =>
      (c, Array.tabulate(4)(d => if (d == c) 1.0f else 0.0f), c.toInt)
    }.toDF("vec_id", "embedding", "label")
    Embeddings.buildIvfIndex(seed, dir)
    dir
  }

  private def unit(c: Int): Array[Float] =
    Array.tabulate(4)(d => if (d == c) 1.0f else 0.0f)

  /** Tilted copy of basis c: cos to the basis = cos(angle) ≈ 1−tilt²/2;
    * still routes to cell c (nearest centroid). */
  private def tilted(c: Int, tilt: Float): Array[Float] = {
    val v = Array.tabulate(4)(d => if (d == c) 1.0f else 0.0f)
    v((c + 1) % 4) = tilt
    val n = math.sqrt(1.0 + tilt * tilt).toFloat
    v.map(_ / n)
  }

  private def ar(c: SemDedupIngest.BatchCounts): (Long, Long) = {
    // the counter invariant holds on every batch this spec folds
    assert(c.received === c.droppedDupIds + c.admitted + c.rejected)
    (c.admitted, c.rejected)
  }

  private def postings(dir: String): Set[Long] =
    spark.read.parquet(s"$dir/postings").select("vec_id")
      .collect().map(_.getLong(0)).toSet

  test("store veto, batch-local earliest-wins, distinct-direction admit") {
    val dir = freshIndex()
    // 10: duplicate of stored basis 0 (cos 1.0) -> store-vetoed
    // 11, 12: same new tilted direction in cell 1 (cos 1.0 to each
    //         other, ~0.89 to the stored basis) -> 11 admitted (earliest),
    //         12 batch-local-vetoed
    // 13: moderately tilted in cell 2 (cos to basis ~0.95 < t) -> admitted
    val t = 0.98
    val b = Seq(
      (10L, unit(0)), (11L, tilted(1, 0.5f)), (12L, tilted(1, 0.5f)),
      (13L, tilted(2, 0.3f))
    ).toDF("vec_id", "embedding")
    val c = SemDedupIngest.applyBatch(b, dir, threshold = t)
    assert(ar(c) === ((2L, 2L)))
    // no repeated vec_ids in this batch: every received row is accounted
    // for as admitted or rejected, none dropped
    assert((c.received, c.droppedDupIds) === ((4L, 0L)))
    assert(postings(dir) === Set(0L, 1L, 2L, 3L, 10L, 11L, 12L, 13L)
      .filter(id => id < 4 || id == 11L || id == 13L))

    // cross-batch: a later duplicate of the ADMITTED 11 is store-vetoed
    val b2 = Seq((20L, tilted(1, 0.5f)), (21L, tilted(3, 0.6f)))
      .toDF("vec_id", "embedding")
    assert(ar(SemDedupIngest.applyBatch(b2, dir, threshold = t)) === ((1L, 1L)))
    assert(postings(dir).contains(21L) && !postings(dir).contains(20L))
  }

  test("replay re-derives identical decisions and appends nothing (no self-veto)") {
    val dir = freshIndex()
    val t = 0.98
    val b = Seq(
      (10L, unit(0)), (11L, tilted(1, 0.5f)), (12L, tilted(1, 0.5f)),
      (13L, tilted(2, 0.3f))
    ).toDF("vec_id", "embedding")
    assert(ar(SemDedupIngest.applyBatch(b, dir, threshold = t)) === ((2L, 2L)))
    val afterFirst = postings(dir)
    // full replay: admitted rows must not self-veto against their own
    // stored copy; rejected rows re-reject (their veto partner is now
    // in the store); postings unchanged
    assert(ar(SemDedupIngest.applyBatch(b, dir, threshold = t)) === ((2L, 2L)))
    assert(postings(dir) === afterFirst)
    assert(spark.read.parquet(s"$dir/postings").count() ===
      afterFirst.size.toLong, "replay appended duplicate postings")
  }

  test("partial-append crash converges: replay fills exactly the remainder") {
    val dir = freshIndex()
    val t = 0.98
    // simulate the crash: first batch admitted 11 only of {11, 12-dup};
    // the 'wider' replay carries 11, 12 AND a new distinct 14
    val b1 = Seq((11L, tilted(1, 0.5f))).toDF("vec_id", "embedding")
    assert(ar(SemDedupIngest.applyBatch(b1, dir, threshold = t)) === ((1L, 0L)))
    val wider = Seq(
      (11L, tilted(1, 0.5f)), (12L, tilted(1, 0.5f)), (14L, tilted(3, 0.4f))
    ).toDF("vec_id", "embedding")
    // 11 re-admits (already present, appends nothing), 12 vetoed (by 11
    // in batch AND store), 14 admitted fresh
    assert(ar(SemDedupIngest.applyBatch(wider, dir, threshold = t)) === ((2L, 1L)))
    val ids = postings(dir)
    assert(ids.contains(11L) && ids.contains(14L) && !ids.contains(12L))
    assert(spark.read.parquet(s"$dir/postings")
      .groupBy("vec_id").count().filter(col("count") > 1).count() === 0L,
      "no vec_id may hold more than one posting after replays")
  }

  test("admission agrees with the batch semDedup duplicate RELATION on ordered arrival") {
    // same-direction groups arriving id-ordered: the stream keeps the
    // earliest of each group; batch semDedup marks all-but-one of each
    // group dup (its survivor POLICY differs — least centroid-typical —
    // but on exact-duplicate groups whose members tie, the earliest id
    // survives there too via the rank tie-break)
    val dir = freshIndex()
    val rows = Seq(
      (30L, tilted(0, 0.7f)), (31L, tilted(0, 0.7f)), (32L, tilted(0, 0.7f)),
      (33L, tilted(1, 0.8f)), (34L, tilted(1, 0.8f)))
    val t = 0.999
    assert(ar(SemDedupIngest.applyBatch(
      rows.toDF("vec_id", "embedding"), dir, threshold = t)) === ((2L, 3L)))
    val streamKept = postings(dir) -- Set(0L, 1L, 2L, 3L)
    assert(streamKept === Set(30L, 33L))
    // batch reference over the same rows with label = routed cell
    val labeled = rows.map { case (id, v) =>
      (id, v, if (id <= 32) 0 else 1) }.toDF("vec_id", "embedding", "label")
    val batchKept = Embeddings.semDedup(labeled, threshold = t)
      .filter(col("is_dup") === 0).select("vec_id")
      .as[Long].collect().toSet
    assert(batchKept === streamKept)
  }

  test("the postings probe partition-prunes to the touched cells (plan-asserted)") {
    // VERDICT r9 #7: the O(touched cells) claim, on the executed plan —
    // the isin over the partition column must land in PartitionFilters
    // (zero data filters survive into the reader for it) and the scan
    // must select exactly the probed partition directories
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = freshIndex()
    // one posting per cell 0..3 already exists (the seeds); probe 2 of 4
    val probe = SemDedupIngest.prunedPostings(spark, s"$dir/postings",
      Seq(1, 2))
    assert(probe.count() === 2L)
    val scans = probe.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.size === 1)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      "the cell isin must reach the scan as a PARTITION filter")
    assert(scan.partitionFilters.mkString(",").contains("cell"),
      scan.partitionFilters.mkString(","))
    assert(scan.selectedPartitions.partitionCount === 2,
      s"probe of 2 cells must select exactly 2 partition dirs, got " +
        s"${scan.selectedPartitions.partitionCount}")
    // and nothing re-filters rows the partition pruning already decided
    assert(scan.dataFilters.isEmpty, scan.dataFilters.mkString(","))
  }

  test("exact-copy collapse: collapsed ≡ uncollapsed decisions on a multiplicity batch, earliest arrival kept") {
    // VERDICT r10 #3 — the crafted multiplicity shape: distinct vec_ids,
    // identical embeddings. 5 copies of a NOVEL direction (ids shuffled
    // so arrival order ≠ listing order; min id 50 must survive), 4
    // copies of a STORED basis (all store-vetoed through their
    // representative), one singleton admit, one same-id replay row. The
    // collapsed plan (the applyBatch default at threshold ≤ 1.0) must
    // reproduce the uncollapsed plan's counters AND its appended set —
    // the multiplicity² pair-work cut is a rewrite, not a policy change.
    def batch() = Seq(
      (52L, tilted(1, 0.5f)), (50L, tilted(1, 0.5f)), (51L, tilted(1, 0.5f)),
      (53L, tilted(1, 0.5f)), (54L, tilted(1, 0.5f)),
      (60L, unit(0)), (61L, unit(0)), (62L, unit(0)), (63L, unit(0)),
      (70L, tilted(2, 0.3f)),
      (70L, tilted(2, 0.3f))
    ).toDF("vec_id", "embedding")
    val t = 0.98
    val dirA = freshIndex()
    val dirB = freshIndex()
    val cA = SemDedupIngest.applyBatchImpl(batch(), dirA, t, collapseExact = true)
    val cB = SemDedupIngest.applyBatchImpl(batch(), dirB, t, collapseExact = false)
    assert((cA.received, cA.droppedDupIds, cA.admitted, cA.rejected) ===
      ((cB.received, cB.droppedDupIds, cB.admitted, cB.rejected)))
    assert(ar(cA) === ((2L, 8L)))
    assert(postings(dirA) === postings(dirB))
    // earliest arrival: the min-id copy of the novel value survives;
    // every later copy is its representative's cos-1.0 veto
    assert(postings(dirA).contains(50L) && postings(dirA).contains(70L))
    assert(Seq(51L, 52L, 53L, 54L, 60L, 61L, 62L, 63L)
      .forall(id => !postings(dirA).contains(id)))
    // and the collapsed store converges under replay exactly like the
    // uncollapsed one (idempotence is untouched by the rewrite)
    val cR = SemDedupIngest.applyBatch(batch(), dirA, threshold = t)
    assert(ar(cR) === ((2L, 8L)))
    assert(postings(dirA) === postings(dirB))
  }

  test("same-batch repeated vec_ids are counted as droppedDupIds, not hidden") {
    val dir = freshIndex()
    // 40 appears twice in one batch (an at-least-once source replaying a
    // row inside the batch); 41 is a distinct new direction
    val b = Seq(
      (40L, tilted(0, 0.6f)), (40L, tilted(0, 0.6f)), (41L, tilted(1, 0.7f))
    ).toDF("vec_id", "embedding")
    val c = SemDedupIngest.applyBatch(b, dir, threshold = 0.999)
    assert((c.received, c.droppedDupIds, c.admitted, c.rejected) ===
      ((3L, 1L, 2L, 0L)))
    assert(postings(dir).contains(40L) && postings(dir).contains(41L))
  }
}
