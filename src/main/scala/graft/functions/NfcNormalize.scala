package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization.
  *
  * Web-scraped training corpora mix composed and decomposed forms of the
  * same grapheme ("é" vs "e"+U+0301), so exact dedup, shingling, and token
  * statistics all fracture unless text is canonicalized first — CCNet and
  * C4 both normalize before hashing. Spark has no built-in for this (the
  * usual fallback is a Scala UDF, which breaks whole-stage codegen exactly
  * where this runs: the per-document hot path before every downstream
  * hash). This wraps `java.text.Normalizer` (ICU-equivalent for NFC) as a
  * codegen'd unary expression, same pattern as [[Md5Prefix64]].
  *
  * The fast path costs nothing extra: `Normalizer.isNormalized` is O(n)
  * scan-only and true for the overwhelmingly-ASCII bulk of a corpus, so
  * already-NFC strings return the input UTF8String without allocation.
  *
  * Oracle twin: DuckDB's `nfc_normalize(x)` — both implement Unicode
  * canonical composition, so outputs are byte-identical.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  val info = new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize")

  /** NFC-normalize; returns the INPUT object unchanged when already
    * normalized (no copy on the common path). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
