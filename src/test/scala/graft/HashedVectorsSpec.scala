package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** Feature-hashed document vectors (hashing trick) + the dominant-dim
  * blocked ANN over them: normalization, sparse/dense agreement, and the
  * twin-ranks-first property that makes the op usable as a text-side
  * near-dup candidate generator.
  */
class HashedVectorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dims = 16

  private def docDF(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))

  private val corpus = docDF(
    (1L, "spark shuffles data across executors during wide transformations", "s1"),
    (2L, "spark shuffles data across executors during wide transformations", "s1"),
    (3L, "spark shuffles data across executors during wide transforms often", "s1"),
    (4L, "completely different subject matter about gardens and flowers blooming", "s2"),
    (5L, "one short doc", "s2"))

  test("hashedTf: vectors are l2-normalized within rounding") {
    val sq = TextOps.hashedTf(corpus, dims)
      .groupBy("doc_id").agg(sum(col("val") * col("val")).as("sq"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sq.size == 5)
    sq.values.foreach(v => assert(math.abs(v - 1.0) < 1e-4, s"norm² $v"))
  }

  test("hashedTf: dims within [0, dims); identical docs get identical sparse rows") {
    val tf = TextOps.hashedTf(corpus, dims).collect()
    assert(tf.forall { r => val d = r.getInt(2); d >= 0 && d < dims })
    def rowsOf(id: Long) =
      tf.filter(_.getLong(0) == id).map(r => (r.getInt(2), r.getDouble(3))).toSet
    assert(rowsOf(1L) == rowsOf(2L))
    assert(rowsOf(1L) != rowsOf(4L))
  }

  test("dense form agrees with sparse form, zero elsewhere") {
    val sparse = TextOps.hashedTf(corpus, dims).collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getDouble(3)).toMap
    val dense = TextOps.hashedDocVectors(corpus, dims).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    assert(dense.size == 5)
    dense.foreach { case (id, vec) =>
      assert(vec.size == dims)
      vec.zipWithIndex.foreach { case (v, d) =>
        assert(v == sparse.getOrElse((id, d), 0.0), s"doc $id dim $d")
      }
    }
  }

  test("hashedKnn: exact twin ranks first at cosine 1.0; ranks are dense and ordered") {
    val knn = TextOps.hashedKnn(corpus, dims, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val first = knn.filter(t => t._1 == 1L && t._4 == 1).head
    // twin cosine is 1.0 up to the 6dp value rounding (Σ of rounded v²)
    assert(first._2 == 2L && first._3 >= 0.999997)
    // per doc: ranks start at 1, are consecutive, and cosine is non-increasing
    knn.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4).toList
      assert(sorted.map(_._4) == (1 to sorted.size).toList)
      assert(sorted.zip(sorted.drop(1)).forall { case (a, b) => a._3 >= b._3 })
    }
    // k bound holds
    assert(knn.groupBy(_._1).values.forall(_.size <= 3))
  }

  /** The block key exactly as the operator derives it: argmax
    * term-count bucket of the md5-hashed projection at width bd, ties to
    * the lowest bucket. */
  private def blockKeys(bd: Long): Map[Long, Long] =
    TextOps.tokenized(corpus)
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"),
        pmod(TextOps.md5Long(concat(lit("dim:"), col("term"))),
          lit(bd)).as("bdim"))
      .agg(count(lit(1)).as("w"))
      .groupBy("doc_id")
      .agg(max(struct(col("w"), (-col("bdim")).as("nd"))).as("m"))
      .select(col("doc_id"), (-col("m.nd")).as("block"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hashedKnn: candidate pairs share the blocking projection's dominant bucket") {
    // default width for this 5-doc corpus: max(2·dims, ⌈5/64⌉) = 32
    val blocks = blockKeys(bd = 2L * dims)
    TextOps.hashedKnn(corpus, dims, k = 3).collect().foreach { r =>
      assert(blocks(r.getLong(0)) == blocks(r.getLong(1)),
        s"pair ${r.getLong(0)}→${r.getLong(1)} crosses blocks")
    }
  }

  test("hashedKnn: blockDims is a real knob — identical docs pair at ANY width") {
    for (bd <- Seq(32, 257)) {
      val knn = TextOps.hashedKnn(corpus, dims, k = 3, blockDims = bd)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      // identical token streams hash identically at every width, so the
      // twin pair survives arbitrarily fine blocking in both directions
      assert(knn.exists(t => t._1 == 1L && t._2 == 2L && t._3 == 1),
        s"twin lost at blockDims=$bd")
      assert(knn.exists(t => t._1 == 2L && t._2 == 1L && t._3 == 1))
      // and the explicit width matches the recomputed block partition
      val blocks = blockKeys(bd.toLong)
      knn.foreach { case (a, b, _) => assert(blocks(a) == blocks(b)) }
    }
  }
}
