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

  test("trainPruned with target ≥ |seed| is exactly train (prune no-ops)") {
    // the degenerate-knob pin (the kmeansTrainSampled pattern): when no
    // round ever prunes, the Kudo loop IS the fixed-vocabulary EM loop
    val corpus = docsDF((1L, "abcab cab ab abcab ba"), (2L, "cab ba abcab"))
    val full = UnigramLm.train(corpus, P, vocabSize = 8, iters = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val pruned = UnigramLm.trainPruned(corpus, P, vocabSize = 8,
        targetSize = 1000, pruneStep = 3, rounds = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(pruned.toSeq === full.toSeq)
  }

  test("trainPruned prunes toward the target, never a single char or essential piece") {
    val corpus = docsDF((1L, "abcab cab ab abcab ba"), (2L, "cab ba abcab"))
    val seedN = UnigramLm.seedVocab(corpus, P, vocabSize = 8).count()
    val out = UnigramLm.trainPruned(corpus, P, vocabSize = 8,
        targetSize = 4, pruneStep = 2, rounds = 3)
      .collect().map(r => (r.getString(0), r.getDouble(2)))
    // strictly smaller than the seed, every single char still covered
    // (chars of the corpus words: a, b, c), probabilities a distribution
    assert(out.length < seedN)
    val pieces = out.map(_._1).toSet
    assert(Set("a", "b", "c").subsetOf(pieces),
      s"single chars must survive any prune: $pieces")
    assert(math.abs(out.map(_._2).sum - 1.0) < 1e-4)
    // the loop prunes min(pruneStep, |vocab|−target) per round: 3 rounds
    // × 2 from a seed of `seedN` can reach at most seedN−6
    assert(out.length >= math.max(4, seedN - 6).toInt)
  }

  test("one round of trainPruned ≡ one emRound + one hand-replayed prune") {
    // iterative ≡ one-shot on a hand-checkable corpus: with rounds = 1
    // the loop is exactly EM-once-then-prune-once; replay the prune by
    // hand from the emStep probabilities and pruneVocab's loss ranking
    val corpus = docsDF((1L, "abcab cab ab abcab ba"), (2L, "cab ba abcab"))
    val got = UnigramLm.trainPruned(corpus, P, vocabSize = 8,
        targetSize = 4, pruneStep = 2, rounds = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // the emStep surface exposes exactly round 1's renormalized probs
    val em = UnigramLm.emStep(corpus, P, vocabSize = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // survivors: |seed| − min(2, |seed|−4) lowest-loss non-essential
    // multi-char pieces dropped; probs = em probs renormalized over the
    // survivor set (6dp, 1e-6 floor)
    assert(got.size === math.max(4, em.size - 2))
    got.keys.foreach(p => assert(em.contains(p)))
    val totKept = math.rint(got.keys.map(em).sum * 1e6) / 1e6
    got.foreach { case (p, prob) =>
      val expected = math.max(math.rint(em(p) / totKept * 1e6) / 1e6, 1e-6)
      assert(math.abs(prob - expected) < 2e-6, s"$p: $prob vs $expected")
    }
  }
}
