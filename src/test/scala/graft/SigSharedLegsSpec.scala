package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pair-set equivalence of the shared-signature dedup legs (VERDICT r12
  * #2: the bde7d6c factorings shipped without a spec).
  *
  * [[TextOps.dedupAgreement]] computes `fuzzySignature` ONCE and feeds
  * the same frame to `fuzzyMatchesPrefixBlockedOnSigs` and
  * `snmPairsOnSigs`; these must return exactly the pair sets of the
  * direct entry points (`fuzzyMatchesPrefixBlocked`, `snmPairs`), which
  * recompute the signature from text. The corpus is crafted to exercise
  * every branch: exact template near-dups (match in both legs), a
  * diverged-prefix pair (blocked out of the fuzzy leg), cross-source
  * pairs (SNM ignores source; fuzzy blocks on it), and unique docs.
  */
class SigSharedLegsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = {
    // template near-dups differ in ONE late-sorting short token (v1/v2/v3)
    // so their sorted-distinct-token signatures share the 8-char block
    // prefix and sit ≤3 edits apart (inside the 0.95 band); doc 4's extra
    // 'aa' token shifts the signature PREFIX, exercising the blocked-out
    // branch; doc 6 duplicates doc 1 across sources (SNM pairs it, the
    // source-blocked fuzzy leg must not).
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tpl = (i: Int) => s"$base v$i"
    (Seq(
      (1L, tpl(1), "s1"), (2L, tpl(2), "s1"), (3L, tpl(3), "s2"),
      (4L, s"aa $base v1", "s1"),
      (5L, "completely different words about spark shuffles and codegen", "s2"),
      (6L, tpl(1), "s2"), (7L, base + " short", "s1")
    )).toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
  }

  private def sigsOf(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"), col("source"),
      TextOps.fuzzySignature(col("text"), 160).as("sig"))

  test("fuzzyMatchesPrefixBlockedOnSigs over precomputed sigs == direct form") {
    val direct = TextOps.fuzzyMatchesPrefixBlocked(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    val onSigs = TextOps.fuzzyMatchesPrefixBlockedOnSigs(sigsOf(corpus))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(direct.nonEmpty, "crafted corpus must produce fuzzy pairs")
    assert(onSigs == direct)
  }

  test("snmPairsOnSigs over precomputed sigs == direct snmPairs") {
    val direct = TextOps.snmPairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val onSigs = TextOps.snmPairsOnSigs(sigsOf(corpus).select("doc_id", "sig"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(direct.nonEmpty, "crafted corpus must produce SNM pairs")
    assert(onSigs == direct)
  }

  test("dedupAgreement counts reconcile with the standalone pair legs") {
    val d = corpus
    val report = TextOps.dedupAgreement(d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fuzzy = TextOps.fuzzyMatchesPrefixBlocked(d)
      .select("doc_id_a", "doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextOps.lshCandidatePairs(d).filter(col("jaccard") >= 0.5)
      .select("doc_id_a", "doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val snm = TextOps.snmPairs(d)
      .select("doc_id_a", "doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(report("fuzzy") == fuzzy.size.toLong)
    assert(report("lsh") == lsh.size.toLong)
    assert(report("snm") == snm.size.toLong)
    assert(report("fuzzy_and_lsh") == (fuzzy intersect lsh).size.toLong)
    assert(report("fuzzy_and_snm") == (fuzzy intersect snm).size.toLong)
    assert(report("lsh_and_snm") == (lsh intersect snm).size.toLong)
  }
}
