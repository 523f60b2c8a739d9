package graft

import org.apache.spark.sql.SparkSession

/** Scratch: run one registered query with the UI enabled, then park, so
  * the SQL tab's per-operator metrics can be read over the REST API.
  * Deleted when the round's findings are recorded. */
object ExpAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("EXP_AQE", "true"))
      .config("spark.ui.enabled", sys.env.getOrElse("EXP_UI", "true"))
      .getOrCreate()
    graft.functions.GraftFunctions.register(spark)
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"$name timed ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    if (sys.env.get("EXP_PARK").forall(_ == "1")) {
      println("PARKED — UI at port 4040; ctrl-c to exit")
      Thread.sleep(600000)
    }
    spark.stop()
  }
}
