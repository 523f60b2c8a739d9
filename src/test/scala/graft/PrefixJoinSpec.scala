package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** PPJoin prefix-filtered set-similarity join: exactness (= brute force,
  * 100% recall) and the prefix filter actually pruning candidates.
  */
class PrefixJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** token-set form: items = distinct tokens (the spec exercises the
    * generic set join; the registered query passes shingle sets). */
  private def setDF(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("items"))

  private def bruteJaccard(rows: Seq[(Long, String)], t: Double) = {
    val sets = rows.map { case (id, txt) => id -> txt.split(" ").toSet }
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= t
    } yield (a, b, math.rint(j * 1e6) / 1e6)).toSet
  }

  test("matches brute-force all-pairs exactly (100% recall, no false hits)") {
    val rows = Seq[(Long, String)](
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over a lazy dog"),   // near-dup of 1
      (3L, "completely different words here entirely now"),
      (4L, "the quick brown fox leaps over the lazy dog"), // near-dup of 1,2
      (5L, "quick brown fox"),                             // subset, low J
      (6L, "completely different words here entirely now") // exact dup of 3
    )
    val got = TextOps.prefixJaccardPairs(setDF(rows: _*), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == bruteJaccard(rows, 0.5))
    // sanity: the exact dup pair is present at J = 1.0
    assert(got.exists { case (a, b, j) => a == 3L && b == 6L && j == 1.0 })
  }

  test("threshold 1.0 returns only exact set matches") {
    val rows = Seq[(Long, String)](
      (1L, "a b c"), (2L, "c b a"), (3L, "a b c d"))
    val got = TextOps.prefixJaccardPairs(setDF(rows: _*), 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == Set((1L, 2L)))
  }

  test("positional filter never drops a true pair: random-corpus parity at 3 thresholds") {
    // 60 docs over a 24-token vocabulary, sizes 3..10 — dense enough that
    // prefixes collide constantly and the positional bound does real
    // pruning; brute force is the ground truth. Any false dismissal from
    // the min-over-occurrences upper bound shows up as a missing pair.
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 24).map(i => s"t$i")
    val rows: Seq[(Long, String)] = (1L to 60L).map { id =>
      val n = 3 + rnd.nextInt(8)
      id -> rnd.shuffle(vocab).take(n).mkString(" ")
    }
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val got = TextOps.prefixJaccardPairs(setDF(rows: _*), t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == bruteJaccard(rows, t), s"mismatch at threshold $t")
    }
  }

  test("verify ladder: every rung returns identical pairs (r7)") {
    // force each rung via the session broadcast threshold on a fresh
    // session: default → rung 1 (corpus broadcast); 4KB → corpus
    // declines but the pair list and the j1-with-arrays frame fit
    // (rung 2a); 600B → only the id-only pair list fits (rung 2b);
    // 1B → everything declines (rung 3 shuffle joins)
    val rows = Seq[(Long, String)](
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over a lazy dog"),
      (3L, "completely different words here entirely now"),
      (4L, "the quick brown fox leaps over the lazy dog"),
      (5L, "quick brown fox"),
      (6L, "completely different words here entirely now"))
    val expected = bruteJaccard(rows, 0.5)
    for (thr <- Seq("10MB", "4096", "600", "1")) {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      graft.functions.GraftFunctions.register(s2)
      import s2.implicits._
      val df = rows.toDF("doc_id", "text")
        .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("items"))
      val got = TextOps.prefixJaccardPairs(df, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected, s"rung mismatch at threshold $thr")
    }
  }

  test("prefix filter prunes: candidate pairs < all pairs on disjoint docs") {
    // 20 docs sharing only one very frequent token would all collide in
    // a naive token join; rarest-first prefixes keep them apart when the
    // frequent token never enters a prefix
    val rows = (1L to 20L).map(i => (i, s"common u$i v$i w$i x$i y$i z$i"))
    val df = setDF(rows: _*)
    assert(TextOps.prefixJaccardPairs(df, 0.5).count() == 0)
    // the shared token 'common' appears in every doc (tf=20) while each
    // doc's 6 unique tokens have tf=1 — prefix length is 7-ceil(3.5)+1=4,
    // all rarest-first, so 'common' (rank 7) is never a prefix token and
    // the candidate set is EMPTY, not 190 pairs
    val tok = df.select(col("doc_id"), explode(col("items")).as("tok"))
    assert(tok.filter(col("tok") === "common").count() == 20)
  }
}
