package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.UnigramLm

/** Unigram-LM tokenizer: lattice DP vs brute-force segmentation
  * enumeration, vocabulary coverage, and EM-step invariants.
  */
class UnigramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val P = 4

  /** All segmentations of `w` into pieces of length <= P that exist in
    * `vocab`, as piece lists. */
  private def segmentations(w: String, vocab: Map[String, Double]): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to math.min(P, w.length)).flatMap { l =>
      val head = w.substring(0, l)
      if (vocab.contains(head)) segmentations(w.substring(l), vocab).map(head +: _)
      else Seq.empty
    }

  private def docsDF(texts: (Long, String)*) = {
    import spark.implicits._
    texts.toDF("doc_id", "text")
  }

  test("scoreWords matches brute-force marginal and Viterbi likelihoods") {
    val corpus = docsDF((1L, "abcab cab ab abcab ba"), (2L, "cab ba abcab"))
    val vocab = UnigramLm.seedVocab(corpus, P, vocabSize = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val got = UnigramLm.scoreWords(corpus, P, vocabSize = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val words = Seq("abcab", "cab", "ab", "ba")
    words.foreach { w =>
      val segs = segmentations(w, vocab)
      assert(segs.nonEmpty, s"$w unsegmentable under $vocab")
      val probs = segs.map(_.map(vocab).product)
      val expViterbi = math.rint(math.log(probs.max) * 1e6) / 1e6
      val expMarginal = math.rint(math.log(probs.sum) * 1e6) / 1e6
      val (vit, marg) = got(w)
      assert(math.abs(vit - expViterbi) < 2e-6, s"$w viterbi $vit vs $expViterbi")
      assert(math.abs(marg - expMarginal) < 2e-6, s"$w marginal $marg vs $expMarginal")
      assert(vit <= marg + 1e-9, s"$w: viterbi above marginal")
    }
  }

  test("seedVocab covers every character and probabilities sum to 1") {
    val corpus = docsDF((1L, "hello world held low rolled"))
    val v = UnigramLm.seedVocab(corpus, P, vocabSize = 10).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val chars = "helloworldheldlowrolled".toSet.map((c: Char) => c.toString)
    chars.foreach(c => assert(v.contains(c), s"char $c missing from vocab"))
    assert(math.abs(v.values.sum - 1.0) < 1e-9)
  }

  test("emStep expected counts match brute-force posterior piece counts") {
    // single-word corpus: the posterior over segmentations is enumerable
    val corpus = docsDF((1L, "abab"))
    val vocab = UnigramLm.seedVocab(corpus, P, vocabSize = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val segs = segmentations("abab", vocab)
    val probs = segs.map(_.map(vocab).product)
    val z = probs.sum
    val expCounts = segs.zip(probs).flatMap { case (seg, pr) =>
      seg.map(_ -> pr / z)
    }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    val got = UnigramLm.emStep(corpus, P, vocabSize = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    expCounts.foreach { case (piece, ec) =>
      assert(math.abs(got(piece) - ec) < 2e-6,
        s"piece $piece expected $ec got ${got(piece)}")
    }
    // pieces sum: expected total pieces = weighted mean segmentation length
    val totalExpected = expCounts.values.sum
    assert(math.abs(got.values.sum - totalExpected) < 1e-5)
  }

  test("segmentWords returns the max-probability segmentation (ties to longest first piece)") {
    val corpus = docsDF((1L, "abcab cab ab abcab ba"), (2L, "cab ba abcab"))
    val vocab = UnigramLm.seedVocab(corpus, P, vocabSize = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val got = UnigramLm.segmentWords(corpus, P, vocabSize = 8)
      .collect().map(r => r.getString(0) ->
        (r.getString(2), r.getInt(3), r.getDouble(4))).toMap
    Seq("abcab", "cab", "ab", "ba").foreach { w =>
      val segs = segmentations(w, vocab)
      val best = segs.map(seg => (seg.map(vocab).product, seg)).maxBy(_._1)
      val (segStr, n, lp) = got(w)
      val gotPieces = segStr.split("\\|").toSeq
      // the returned segmentation must BE a valid segmentation achieving
      // the optimum product (the exact piece choice at ties is pinned by
      // the lowest-start rule; probability must match the brute optimum)
      assert(gotPieces.mkString("") == w, s"$w: pieces do not respell the word")
      assert(gotPieces.forall(vocab.contains), s"$w: piece outside vocab")
      val gotProd = gotPieces.map(vocab).product
      assert(math.abs(math.log(gotProd) - math.log(best._1)) < 1e-9,
        s"$w: got $gotPieces (${math.log(gotProd)}), best ${best._2}")
      assert(n == gotPieces.length)
      assert(math.abs(lp - math.rint(math.log(best._1) * 1e6) / 1e6) < 2e-6)
    }
  }
}
