package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Classifier

/** [[Classifier]] — the distributed batch-GD logistic regression must
  * reproduce a sequential reference implementation exactly (the per-
  * iteration 1e-6 weight rounding pins both sides), and the metric
  * operators must match hand-computable fixtures.
  */
class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docDF(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))

  /** Sequential reference: identical math, one thread, no Spark. */
  private def referenceTrain(docs: Seq[(Long, String, Int)], buckets: Int,
                             iters: Int, lr: Double): Map[Long, Double] = {
    def md5p64(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
    }
    val feats = docs.map { case (_, text, y) =>
      val toks = text.split(" ")
      val counts = toks.groupBy(t => md5p64(t) % buckets)
        .map { case (b, ts) => b -> ts.length.toDouble / toks.length }
      (counts + (-1L -> 1.0), y.toDouble)
    }
    val n = docs.size.toDouble
    var w = Map.empty[Long, Double].withDefaultValue(0.0)
    for (_ <- 0 until iters) {
      val grads = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      feats.foreach { case (x, y) =>
        val z = x.map { case (b, v) => w(b) * v }.sum
        val r = 1.0 / (1.0 + math.exp(-z)) - y
        x.foreach { case (b, v) => grads(b) += r * v }
      }
      w = (-1L until buckets.toLong).map { b =>
        b -> math.rint((w(b) - lr * grads(b) / n) * 1e6) / 1e6
      }.toMap.withDefaultValue(0.0)
    }
    w
  }

  private val fixture = Seq(
    (1L, "good clean prose with the usual words", 1),
    (2L, "the quick brown fox jumps over it", 1),
    (3L, "spam spam spam buy now spam spam", 0),
    (4L, "zzz xxx qqq www vvv kkk", 0),
    (5L, "more ordinary text in the corpus here", 1),
    (6L, "buy buy buy now now cheap cheap", 0))

  test("distributed training matches the sequential reference bit-for-bit") {
    val df = docDF(fixture.map { case (id, t, y) =>
      (id, t, if (y == 1) "en" else "xx")
    }: _*)
    val model = Classifier.logregTrain(df, col("lang") === "en",
      buckets = 16, iters = 4, lr = 0.5)
    val ref = referenceTrain(fixture, buckets = 16, iters = 4, lr = 0.5)
    assert(model.weights == ref)
  }

  test("training separates the planted classes; more iterations reduce loss") {
    val df = docDF(fixture.map { case (id, t, y) =>
      (id, t, if (y == 1) "en" else "xx")
    }: _*)
    def loss(iters: Int): Double = {
      val m = Classifier.logregTrain(df, col("lang") === "en",
        buckets = 16, iters = iters, lr = 0.5)
      val scored = Classifier.logregScore(df, m, buckets = 16)
        .join(df.select(col("doc_id"), (col("lang") === "en")
          .cast("double").as("y")), "doc_id")
      scored.select(avg(-(col("y") * log(col("score")) +
        (lit(1.0) - col("y")) * log(lit(1.0) - col("score"))))).first().getDouble(0)
    }
    val l1 = loss(1); val l8 = loss(8)
    assert(l8 < l1, s"loss did not decrease: $l1 -> $l8")
    // and the trained scorer ranks a positive above a negative
    val m = Classifier.logregTrain(df, col("lang") === "en",
      buckets = 16, iters = 8, lr = 0.5)
    val s = Classifier.logregScore(df, m, buckets = 16).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(1L) > s(4L))
  }

  test("auc: perfect separation 1.0, reversed 0.0, all-tied 0.5") {
    val df = Seq((1L, 10, 1), (2L, 20, 1), (3L, 1, 0), (4L, 2, 0))
      .toDF("doc_id", "s", "y")
    def a(score: org.apache.spark.sql.Column) =
      Classifier.auc(df, score, col("y") === 1).first().getAs[Double]("auc")
    assert(a(col("s")) == 1.0)
    assert(a(-col("s")) == 0.0)
    assert(a(lit(7)) == 0.5)
  }

  test("auc: midrank tie handling matches the closed form") {
    // scores: pos {3, 2}, neg {2, 1} — pairs: (3>2)=1, (3>1)=1, (2=2)=.5,
    // (2>1)=1 → auc = 3.5/4
    val df = Seq((1L, 3, 1), (2L, 2, 1), (3L, 2, 0), (4L, 1, 0))
      .toDF("doc_id", "s", "y")
    val r = Classifier.auc(df, col("s"), col("y") === 1).first()
    assert(r.getAs[Double]("auc") == 0.875)
    assert(r.getAs[Long]("n_pos") == 2 && r.getAs[Long]("n_neg") == 2)
  }

  test("calibration: bins are fixed-width, rates are per-bin label means") {
    val df = Seq((1L, 0.05, 0), (2L, 0.08, 1), (3L, 0.95, 1), (4L, 1.0, 1))
      .toDF("doc_id", "s", "y")
    val bins = Classifier.calibration(df, col("s"), col("y") === 1)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(bins(0) == (2L, 0.5))     // 0.05, 0.08 → bin 0, half positive
    assert(bins(9) == (2L, 1.0))     // 0.95 and the 1.0 edge clamp to bin 9
  }
}
