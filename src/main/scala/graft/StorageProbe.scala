package graft

import org.apache.spark.sql.SparkSession

/** Storage-footprint probe (r13 instrument, guide §5): runs the named
  * registered queries (bench session shape) and prints, at the moment the
  * query's action completes (BEFORE the bench's dropStorage would run),
  * every RDD still held by the BlockManager — id, storage level, cached
  * partitions, memory and disk bytes. This is the number the bench's
  * seconds cannot show: how much unified-pool storage a composite query's
  * persists/checkpoints occupy while its own tasks are still executing,
  * i.e. the execution-memory squeeze at high core counts.
  *
  * Usage: runMain graft.StorageProbe <queryName> [more ...]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
  */
object StorageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.GraftFunctions.register(spark)
    spark.sparkContext.setLogLevel("WARN")
    def dropStorage(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      try fn(spark, sfDir).count()
      catch { case e: Throwable => println(s"$name FAILED: ${e.getMessage}") }
      val infos = spark.sparkContext.getRDDStorageInfo
      val totalMem = infos.map(_.memSize).sum
      val totalDisk = infos.map(_.diskSize).sum
      println(f"%n===== $name%s: ${infos.length}%d stored RDDs, " +
        f"mem ${totalMem / 1048576.0}%.1f MB, disk ${totalDisk / 1048576.0}%.1f MB =====")
      infos.sortBy(-_.memSize).foreach { i =>
        println(f"  rdd ${i.id}%5d ${i.storageLevel.description}%-32s " +
          f"parts ${i.numCachedPartitions}%4d  mem ${i.memSize / 1048576.0}%8.2f MB" +
          f"  disk ${i.diskSize / 1048576.0}%8.2f MB  ${i.name}%s")
      }
      dropStorage()
    }
    spark.stop()
  }
}
