package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Jaro-Winkler string similarity — the
  * alignment-based record-linkage metric (Winkler 1990), complementing the
  * engine's edit-distance (`levenshtein`) and set-overlap (Jaccard) dedup
  * geometries. Spark has no built-in for it, so this is the SURVEY §7.3
  * "custom Expression where built-ins genuinely can't express it" case;
  * `doGenCode` keeps the call inside whole-stage codegen.
  *
  * Semantics are calibrated bit-for-bit against the DuckDB oracle's
  * `jaro_winkler_similarity` (verified on 4000 random string pairs):
  *  - either side empty → 0.0 (including both empty);
  *  - match window = max(len)/2 − 1 (floored, min 0), greedy first-match
  *    scan in window order;
  *  - transpositions t = floor(mismatched-aligned-matches / 2);
  *  - jaro = (m/len1 + m/len2 + (m − t)/m) / 3;
  *  - Winkler boost only when jaro > 0.7: j + p·0.1·(1 − j) with p the
  *    common prefix capped at 4.
  * The floating-point evaluation order mirrors the reference
  * implementation exactly, so unrounded doubles agree across engines.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires (STRING, STRING), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.sim(l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinkler.sim($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  val info = new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler")

  /** See class doc for the exact reference semantics this mirrors. */
  def sim(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    var window = math.max(l1, l2) / 2 - 1
    if (window < 0) window = 0
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val c = s1.charAt(i)
      val hi = math.min(l2, i + window + 1)
      var j = math.max(0, i - window)
      var matched = false
      while (j < hi && !matched) {
        if (!m2(j) && s2.charAt(j) == c) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val tt = t / 2
    val md = m.toDouble
    val j = (md / l1 + md / l2 + (md - tt) / md) / 3.0
    if (j > 0.7) {
      val pMax = math.min(4, math.min(l1, l2))
      var p = 0
      while (p < pMax && s1.charAt(p) == s2.charAt(p)) p += 1
      j + p * 0.1 * (1.0 - j)
    } else j
  }
}
