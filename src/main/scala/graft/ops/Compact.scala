package graft.ops

import java.io.File
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction: the table-maintenance pass every long-lived
  * ingestion sink needs. Streaming appends and incremental batches leave
  * datasets as thousands of KB-sized files; scans then pay one task +
  * one footer read per file and the NameNode/listing pays per object.
  * Compaction rewrites the dataset into ~targetBytes files.
  *
  * Shape: size the output by MEASURED input bytes (not row counts —
  * compression varies), `repartition(n)` for even round-robin output,
  * optionally `sortWithinPartitions` to restore cluster-by layout (so
  * parquet min/max stats prune again after the rewrite), write to a temp
  * sibling, then swap directories. The swap is rename-based: atomic on a
  * POSIX dir / HDFS, last-wins on object stores (where production would
  * commit via a table format's metadata transaction instead — documented
  * trade, same operator shape).
  *
  * This is the FLAT-directory form, for plain datasets nothing reads
  * mid-rewrite. A versioned snapshot table compacts through
  * [[graft.mars.Incremental.compact]] instead — atomic marker publish,
  * racing readers unharmed, conflict-abort against racing merges — and
  * this operator refuses such roots rather than swap a directory whose
  * layout carries commit markers.
  */
object Compact {

  final case class CompactStats(filesBefore: Int, filesAfter: Int,
                                bytes: Long, rows: Long)

  private def parquetFiles(dir: File): Array[File] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L << 20,
              sortCols: Seq[String] = Nil): CompactStats = {
    val d = new File(dir)
    require(Option(d.list()).getOrElse(Array.empty[String])
        .forall(n => !n.startsWith("_commit_")),
      s"$dir is a versioned snapshot table — use Incremental.compact " +
        "(atomic publish; a directory swap here would tear its commit markers)")
    val before = parquetFiles(d)
    val totalBytes = before.map(_.length()).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val df = spark.read.parquet(dir)
    val repart = df.repartition(n)
    val laidOut =
      if (sortCols.isEmpty) repart
      else repart.sortWithinPartitions(sortCols.map(col): _*)
    val tmp = dir.stripSuffix("/") + "__compact_tmp"
    laidOut.write.mode(SaveMode.Overwrite).parquet(tmp)
    val rows = spark.read.parquet(tmp).count()

    val old = new File(dir.stripSuffix("/") + "__compact_old")
    require(d.renameTo(old), s"could not stage old dir $dir")
    require(new File(tmp).renameTo(d), s"could not swap compacted dir into $dir")
    def rm(f: File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
    }
    rm(old)
    CompactStats(before.length, parquetFiles(d).length, totalBytes, rows)
  }
}
