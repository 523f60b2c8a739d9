package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lineage-cut helpers (r13, guide §5 / VERDICT r12 #1).
  *
  * `Dataset.localCheckpoint()`'s default storage level keeps one
  * deserialized UnsafeRow OBJECT per row (MEMORY_AND_DISK) — several×
  * the raw bytes on narrow corpus-sized frames, and block release is
  * ContextCleaner-best-effort, so a composite query's checkpoints
  * squeeze the unified memory pool exactly when 32 concurrent tasks
  * split it (the BENCH_r12 32-core anti-scaling signature). For
  * CORPUS-SIZED cuts, serialized blocks store the rows contiguously at
  * a fraction of the footprint; the re-read is a flat buffer walk.
  * Vocab-/model-/pair-sized cuts stay on the default level — their
  * blocks are bounded and the deserialized form skips the copy.
  */
object Checkpoints {
  /** Eager localCheckpoint with serialized, spillable block storage —
    * the bounded-footprint lineage cut for corpus-sized frames. */
  def ser(df: DataFrame): DataFrame =
    df.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
}
