package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sim.Embeddings

/** Scratch isolation experiment for the r12 optimization round: times the
  * primitive stages the embedding-family operators compose, over the same
  * session shape as Bench, to locate the per-task constant the profiler
  * surfaced (0.2-0.4 s/task on 2k-row inputs). Not registered anywhere;
  * deleted when the round's findings are recorded.
  */
object ExpVec {
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

    def time(name: String)(body: => Unit): Unit = {
      body // warm
      val runs = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-40s median ${runs.sorted.apply(1)}%.3f s  (${runs.map(r => f"$r%.3f").mkString(", ")})")
    }

    // stage-latency floor: zero-work stages at 32 tasks, with/without a
    // shuffle, and the same at 1 task — what any N-stage query must pay
    time("floor: 32-task no-shuffle count")(
      spark.range(0L, 32L, 1L, 32).queryExecution.toRdd.count())
    time("floor: 1-exchange (32->32) count")(
      spark.range(0L, 3200L, 1L, 32).repartition(32)
        .queryExecution.toRdd.count())
    time("floor: groupBy count (1 exchange)")(
      spark.range(0L, 3200L, 1L, 32).groupBy(pmod(col("id"), lit(7L)))
        .count().queryExecution.toRdd.count())
    time("floor: 2 chained groupBys")(
      spark.range(0L, 3200L, 1L, 32)
        .groupBy(pmod(col("id"), lit(97L)).as("k")).count()
        .groupBy(pmod(col("k"), lit(7L))).sum("count")
        .queryExecution.toRdd.count())
    time("floor: broadcast join tiny")(
      spark.range(0L, 3200L, 1L, 32)
        .join(broadcast(spark.range(0L, 16L, 1L, 1)
          .select(col("id").as("k"))), pmod(col("id"), lit(16L)) === col("k"))
        .queryExecution.toRdd.count())

    val raw = Tables.embeddings(spark, sfDir)
    time("scan count")(raw.count())
    time("scan noop")(raw.write.format("noop").mode("overwrite").save())
    val e = raw.select(col("vec_id"), Embeddings.asDouble(col("embedding")).as("emb"))
    time("asDouble noop")(e.write.format("noop").mode("overwrite").save())
    val en = e.withColumn("vnorm", sqrt(call_function("vec_dot", col("emb"), col("emb"))))
    time("asDouble+norm noop")(en.write.format("noop").mode("overwrite").save())

    // 16 centroids from label seed, broadcast argmax assign
    val cents = Embeddings.centroids(
      e.select(pmod(col("vec_id"), lit(16L)).as("label"), col("emb").as("embedding")))
    time("centroids (16) collect")(cents.collect())
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("acos", call_function("vec_dot", col("emb"), col("cemb")))
      .groupBy("vec_id")
      .agg(max(struct(col("acos").as("s"), (-col("cell")).as("nc"))).as("m"))
    time("assign 2k x 16 noop")(assigned.write.format("noop").mode("overwrite").save())

    // decompose the assign: cross join alone, agg alone, agg without struct
    val crossed = e.crossJoin(broadcast(cents))
      .withColumn("acos", call_function("vec_dot", col("emb"), col("cemb")))
    time("cross 2k x 16 noop")(
      crossed.write.format("noop").mode("overwrite").save())
    val crossedCk = crossed.select("vec_id", "cell", "acos").localCheckpoint()
    time("agg max(struct) on ck noop")(
      crossedCk.groupBy("vec_id")
        .agg(max(struct(col("acos").as("s"), (-col("cell")).as("nc"))).as("m"))
        .write.format("noop").mode("overwrite").save())
    time("agg max(double) on ck noop")(
      crossedCk.groupBy("vec_id").agg(max(col("acos")).as("m"))
        .write.format("noop").mode("overwrite").save())
    val assignedNoF = e.crossJoin(broadcast(cents))
      .withColumn("acos", call_function("vec_dot", col("emb"), col("cemb")))
      .select("vec_id", "cell", "acos")
      .groupBy("vec_id")
      .agg(max(struct(col("acos").as("s"), (-col("cell")).as("nc"))).as("m"))
    time("assign no-emb-carry noop")(
      assignedNoF.write.format("noop").mode("overwrite").save())
    val assignedF = e.crossJoin(broadcast(cents))
      .withColumn("acos", call_function("vec_dot", col("emb"), col("cemb")))
      .groupBy("vec_id")
      .agg(first(col("emb")).as("emb"),
        max(struct(col("acos").as("s"), (-col("cell")).as("nc"))).as("m"))
    time("assign first(emb) carry noop")(
      assignedF.write.format("noop").mode("overwrite").save())

    // variants of the cross join to isolate the constant
    val crossLit = e.crossJoin(broadcast(cents)).withColumn("acos", lit(1.0))
    time("cross lit-cos noop")(
      crossLit.write.format("noop").mode("overwrite").save())
    val crossNarrow = e.select("vec_id").crossJoin(broadcast(cents.select("cell")))
    time("cross narrow noop")(
      crossNarrow.write.format("noop").mode("overwrite").save())
    val centsCk = cents.localCheckpoint()
    val crossCk = e.crossJoin(broadcast(centsCk))
      .withColumn("acos", call_function("vec_dot", col("emb"), col("cemb")))
    time("cross ck-cents noop")(
      crossCk.write.format("noop").mode("overwrite").save())
    val e2 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), Embeddings.asDouble(col("embedding")).as("emb"))
    val cross1p = e2.crossJoin(broadcast(centsCk))
      .withColumn("acos", call_function("vec_dot", col("emb"), col("cemb")))
    time("cross 1-partition noop")(
      cross1p.write.format("noop").mode("overwrite").save())

    // task metrics for the cross stage
    val rec = new ProfileQuery.Rec
    spark.sparkContext.addSparkListener(rec)
    crossCk.write.format("noop").mode("overwrite").save()
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(rec)
    rec.jobs.values.foreach { j =>
      val taskMs = j.stages.map(_.runMs).sum
      println(f"cross job ${j.id} wall ${j.wallMs / 1000.0}%.2f s task ${taskMs / 1000.0}%.2f s stages ${j.stages.map(s => s"${s.tasks}t/${s.runMs}ms").mkString(" ")}")
    }

    // old-vs-new assign shapes, same session
    val oldAssign = e.crossJoin(broadcast(cents))
      .withColumn("acos",
        call_function("vec_dot", col("emb"), col("cemb")) /
          (sqrt(call_function("vec_dot", col("emb"), col("emb"))) *
            sqrt(call_function("vec_dot", col("cemb"), col("cemb")))))
      .groupBy("vec_id")
      .agg(max(struct(col("acos").as("s"), (-col("cell")).as("nc"))).as("m"))
      .select(col("vec_id"), (-col("m.nc")).as("cell"), col("m.s").as("ccos"))
    time("OLD assign noop")(oldAssign.write.format("noop").mode("overwrite").save())
    val centsArr = cents.agg(collect_list(struct(col("cell"), col("cemb"))).as("cents"))
    val newAssign = e.crossJoin(broadcast(centsArr))
      .select(col("vec_id"), call_function("cell_argmax", col("emb"), col("cents")).as("m"))
      .filter(col("m").isNotNull)
      .select(col("vec_id"), col("m.cell").as("cell"), col("m.ccos").as("ccos"))
    time("NEW assign noop")(newAssign.write.format("noop").mode("overwrite").save())
    val centsArrC = cents.coalesce(1).agg(collect_list(struct(col("cell"), col("cemb"))).as("cents"))
    val newAssignC = e.crossJoin(broadcast(centsArrC))
      .select(col("vec_id"), call_function("cell_argmax", col("emb"), col("cents")).as("m"))
      .filter(col("m").isNotNull)
      .select(col("vec_id"), col("m.cell").as("cell"), col("m.ccos").as("ccos"))
    time("NEW assign coalesced-agg noop")(newAssignC.write.format("noop").mode("overwrite").save())

    // within-cell pair pass: 2000 rows over 16 cells ~ 125/cell -> 250k pairs
    val cell = e.withColumn("cell", pmod(col("vec_id"), lit(16L)))
      .withColumn("vnorm", sqrt(call_function("vec_dot", col("emb"), col("emb"))))
    val a = cell.select(col("cell"), col("vec_id").as("id_a"),
      col("emb").as("emb_a"), col("vnorm").as("norm_a"))
    val pairs = a.join(cell, Seq("cell"))
      .filter(col("id_a") < col("vec_id"))
      .select(col("cell"),
        (call_function("vec_dot", col("emb_a"), col("emb")) /
          (col("norm_a") * col("vnorm"))).as("cos"))
    time("pair pass 250k noop")(pairs.write.format("noop").mode("overwrite").save())
    time("pair agg count")(pairs.filter(col("cos") > 0.99).count())

    // same pair pass WITHOUT the 32-way rebalance (single partition input)
    val base1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), Embeddings.asDouble(col("embedding")).as("emb"))
      .withColumn("cell", pmod(col("vec_id"), lit(16L)))
      .withColumn("vnorm", sqrt(call_function("vec_dot", col("emb"), col("emb"))))
    val a1 = base1.select(col("cell"), col("vec_id").as("id_a"),
      col("emb").as("emb_a"), col("vnorm").as("norm_a"))
    val p1 = a1.join(base1, Seq("cell"))
      .filter(col("id_a") < col("vec_id"))
      .select(col("cell"),
        (call_function("vec_dot", col("emb_a"), col("emb")) /
          (col("norm_a") * col("vnorm"))).as("cos"))
    time("pair pass no-rebalance noop")(p1.write.format("noop").mode("overwrite").save())

    spark.stop()
  }
}
