package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Embeddings

/** Bit-equivalence gate for the r12 `mmr_select` expression: the new
  * pool-collected single-expression MMR must reproduce the r11 unrolled
  * operator (k iterations of join + windowed argmax + anti join) EXACTLY
  * — same rows, same doubles, same ranks — on the real test corpus and on
  * crafted tie / pool-exhaustion cases. The unrolled chain below is the
  * verbatim r11 implementation, kept here as the reference semantics. */
class MmrSelectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The r11 mmrSelect, verbatim (modulo localCheckpoint, irrelevant to
    * values): the oracle's CTE chain replays exactly this. */
  private def mmrUnrolled(embeddings: DataFrame, queryFilter: Column,
                          k: Int, pool: Int, lamTenths: Int): DataFrame = {
    val e = embeddings.select(col("vec_id"),
        Embeddings.asDouble(col("embedding")).as("emb"))
      .withColumn("vnorm", Embeddings.norm(col("emb")))
    val cand = Embeddings.knnBruteForce(embeddings, queryFilter, pool)
      .select(col("query_id"), col("neighbor_id"), col("cosine").as("rel"))
      .localCheckpoint()
    val pe = cand.join(e, cand("neighbor_id") === e("vec_id"))
      .select(col("query_id"), col("neighbor_id"), col("emb"), col("vnorm"))
    val psim = pe.select(col("query_id"), col("neighbor_id").as("na"),
        col("emb").as("ea"), col("vnorm").as("norma"))
      .join(pe.select(col("query_id"), col("neighbor_id").as("nb"),
        col("emb").as("eb"), col("vnorm").as("normb")), "query_id")
      .filter(col("na") =!= col("nb"))
      .select(col("query_id"), col("na"), col("nb"),
        round(Embeddings.cosinePre(col("ea"), col("eb"), col("norma"),
          col("normb")), 6).as("sim"))
      .localCheckpoint()
    val wPick = Window.partitionBy("query_id")
      .orderBy(col("score_u").desc, col("neighbor_id").asc)
    def micro(c: Column): Column = round(c * 1000000.0, 0).cast("long")
    var selected: DataFrame = null
    var remaining = cand
    for (i <- 1 to k) {
      val withMs =
        if (selected == null) remaining.withColumn("maxsim", lit(0.0))
        else remaining.join(
          psim.join(selected.select(col("query_id"),
              col("neighbor_id").as("nb")), Seq("query_id", "nb"))
            .groupBy("query_id", "na").agg(max("sim").as("maxsim"))
            .withColumnRenamed("na", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left")
          .withColumn("maxsim", coalesce(col("maxsim"), lit(0.0)))
      val pick = withMs
        .withColumn("score_u", micro(col("rel")) * lamTenths -
          micro(col("maxsim")) * (10 - lamTenths))
        .withColumn("rk", row_number().over(wPick)).filter(col("rk") === 1)
        .select(col("query_id"), col("neighbor_id"),
          lit(i).as("mmr_rank"), col("rel"),
          (col("score_u").cast("double") / 10000000.0).as("score"))
      selected =
        (if (selected == null) pick else selected.unionByName(pick))
          .localCheckpoint()
      remaining = remaining.join(pick.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_anti").localCheckpoint()
    }
    selected
  }

  private def rows(df: DataFrame): Seq[(Long, Long, Int, Double, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
      r.getDouble(3), r.getDouble(4))).toSeq.sortBy(t => (t._1, t._3))

  test("mmr_select ≡ the r11 unrolled chain on the real corpus (bit-exact)") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qf = col("vec_id") < 5
    val got = rows(Embeddings.mmrSelect(e, qf, k = 5, pool = 20, lamTenths = 7))
    val want = rows(mmrUnrolled(e, qf, k = 5, pool = 20, lamTenths = 7))
    assert(got == want)
  }

  test("mmr_select ≡ unrolled on exact-duplicate ties and other λ") {
    // duplicated embeddings ⇒ sim exactly 1.0 between copies, score_u
    // ties ⇒ the lowest-neighbor-id rule decides; λ=3 flips the
    // relevance/diversity weighting
    val vecs = Seq(
      1L -> Seq(1.0f, 0.0f, 0.0f), 2L -> Seq(1.0f, 0.0f, 0.0f),
      3L -> Seq(0.9f, 0.1f, 0.0f), 4L -> Seq(0.9f, 0.1f, 0.0f),
      5L -> Seq(0.0f, 1.0f, 0.0f), 6L -> Seq(0.0f, 0.9f, 0.1f),
      7L -> Seq(0.0f, 0.0f, 1.0f), 8L -> Seq(0.5f, 0.5f, 0.0f),
      9L -> Seq(0.5f, 0.5f, 0.1f), 10L -> Seq(0.2f, 0.2f, 0.9f))
    val e = vecs.toDF("vec_id", "embedding")
    val qf = col("vec_id") <= 2
    val got = rows(Embeddings.mmrSelect(e, qf, k = 4, pool = 6, lamTenths = 3))
    val want = rows(mmrUnrolled(e, qf, k = 4, pool = 6, lamTenths = 3))
    assert(got == want)
  }

  test("mmr_select stops when the pool exhausts before k, like the chain") {
    val vecs = Seq(
      1L -> Seq(1.0f, 0.0f), 2L -> Seq(0.8f, 0.2f), 3L -> Seq(0.0f, 1.0f))
    val e = vecs.toDF("vec_id", "embedding")
    val qf = col("vec_id") === 1L
    // pool of 2 non-self neighbors, k = 5 ⇒ exactly 2 ranks
    val got = rows(Embeddings.mmrSelect(e, qf, k = 5, pool = 10, lamTenths = 7))
    val want = rows(mmrUnrolled(e, qf, k = 5, pool = 10, lamTenths = 7))
    assert(got == want)
    assert(got.size == 2 && got.map(_._3) == Seq(1, 2))
  }

  test("SQL surface: negative k returns empty, null pool entries skip (r13 guards)") {
    graft.functions.GraftFunctions.register(spark)
    // k = -1 must clamp to empty, not NegativeArraySizeException
    val neg = spark.sql(
      """SELECT mmr_select(array(named_struct(
        |  'neighbor_id', 1L, 'rel', 0.5D,
        |  'emb', array(1.0D, 0.0D), 'vnorm', 1.0D)), -1, 7) AS s""".stripMargin)
      .collect()(0).getSeq[Any](0)
    assert(neg.isEmpty)
    // a null-embedding pool entry is skipped, not an NPE; the valid
    // entry still selects
    val mixed = spark.sql(
      """SELECT mmr_select(array(
        |  named_struct('neighbor_id', 1L, 'rel', 0.9D,
        |    'emb', array(1.0D, 0.0D), 'vnorm', 1.0D),
        |  named_struct('neighbor_id', 2L, 'rel', CAST(NULL AS DOUBLE),
        |    'emb', CAST(NULL AS ARRAY<DOUBLE>), 'vnorm', 1.0D)), 2, 7) AS s""".stripMargin)
      .selectExpr("explode(s) AS r").selectExpr("r.neighbor_id")
      .collect().map(_.getLong(0)).toSeq
    assert(mixed == Seq(1L))
  }
}
