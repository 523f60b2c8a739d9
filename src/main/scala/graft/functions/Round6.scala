package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native `round(x, 6)` for doubles — bit-identical to Spark's `Round`
  * (RoundBase, HALF_UP) at scale 6, minus its per-row cost.
  *
  * Spark's double rounding goes `BigDecimal.valueOf(x)` —
  * `Double.toString` (shortest decimal representation), a string parse,
  * a `setScale(6, HALF_UP)`, and a `doubleValue()` — THREE allocations
  * and a grisu formatting per value, even inside whole-stage codegen.
  * On the engine's pair passes (hashedKnn / semDedup / nearDupPairs
  * score every candidate pair before ranking; the 6dp pre-rank round is
  * the repo's cross-engine determinism contract) this is the single
  * hottest scalar: profiled ~500 CPU-seconds for one td_doc_embed_knn
  * run at sf10, a large share of it in the round.
  *
  * Fast path: y = x·1e6 in binary; when y is provably NOT within the
  * error band of a half-integer (|x| bounded so y fits a long), the
  * decimal HALF_UP result equals `(long)(y ± 0.5) / 1e6` — truncation
  * toward zero after adding the signed half is exactly "round half away
  * from zero", and away from the boundary the binary/decimal
  * representation gap (≤ ~5·10⁻¹⁰·|y| for the product plus half-ulp of
  * the shortest-decimal repr) cannot flip the result. Within the guard
  * band (|y − nearest half-integer| < EPS) or past the long-safe
  * magnitude, fall back to the EXACT BigDecimal path — boundary inputs
  * are measure-zero in real data (cosines), so the fallback rate is
  * ~EPS per unit, ≈ 0.1%. NaN/±Infinity pass through, matching Spark.
  *
  * Equivalence is property-pinned in Round6Spec: random doubles,
  * adversarial half-boundary grids, NaN/Inf/±0/denormals, and the
  * engine's own cosine distributions all compare equal to
  * `round(x, 6)` evaluated by Spark.
  */
case class Round6(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"round6 requires DOUBLE input, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "round6"

  override protected def nullSafeEval(input: Any): Any =
    Round6.round6(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Round6.round6($c)")

  override protected def withNewChildInternal(newChild: Expression): Round6 =
    copy(child = newChild)
}

object Round6 {
  /** Guard band in y = x·1e6 units: generous upper bound on the binary
    * product error (≤ 2⁻⁵²·|y| ≈ 2.3e-10·|y| ≤ 1e-3 at |y| = 2²²·1e6…)
    * plus the shortest-decimal half-ulp, for the |y| range the fast
    * path accepts. */
  private final val Eps = 1e-3
  /** |y| bound for the fast path: long-exact and keeps Eps dominant. */
  private final val MaxFast = 4.0e15

  private def slow(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def round6(x: Double): Double = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return x
    val y = x * 1e6
    val ay = math.abs(y)
    if (ay >= MaxFast) return slow(x)
    // distance to the nearest half-integer boundary
    val f = ay - math.floor(ay)
    val distToHalf = math.abs(f - 0.5)
    if (distToHalf < Eps) return slow(x)
    // away from the boundary: half-away-from-zero via signed truncation
    val r = if (y >= 0) (y + 0.5).toLong else (y - 0.5).toLong
    r / 1e6
  }
}
