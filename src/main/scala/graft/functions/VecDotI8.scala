package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType}

/** Pack an int8-range ARRAY<INT> into a BINARY of signed bytes — the
  * shuffle-width half of the quantized pair-verify pair
  * ([[VecDotI8]] is the arithmetic half).
  *
  * Why BINARY and not the int array itself: an UnsafeRow ARRAY<INT> of
  * d elements costs 8 (header) + ceil(d/64)·8 (null bits) + 4·d bytes
  * (~280 B at d = 64); the packed BINARY costs d bytes (64 B). Inside a
  * shuffle-heavy pair join that is the difference between exchanging the
  * corpus and exchanging an eighth of it — the whole point of the
  * SemDeDup int8 pre-verify (VERDICT r8 "Next round" #1).
  *
  * Values are clamped to [-128, 127] (quantizeInt8 emits [-127, 127], so
  * the clamp never engages on the intended input; it makes the function
  * total instead of silently wrapping on out-of-contract ints). A null
  * ARRAY yields null; null ELEMENTS are not checked (same dense-vector
  * contract as [[VecDot]]).
  */
case class I8Pack(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"i8_pack requires ARRAY<INT> input, got ${t.catalogString}")
  }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "i8_pack"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val v = x.getInt(i)
      out(i) = (if (v > 127) 127 else if (v < -128) -128 else v).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  int $v = $a.getInt($i);
         |  $out[$i] = (byte) ($v > 127 ? 127 : ($v < -128 ? -128 : $v));
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): I8Pack =
    copy(child = newChild)
}

object I8Pack {
  val info = new ExpressionInfo(classOf[I8Pack].getName, "i8_pack")
}

/** Signed-byte dot product over two packed int8 vectors (BINARY in, LONG
  * out) — exact integer arithmetic, so the quantized similarity estimate
  * `vec_dot_i8(qa, qb) · scale_a · scale_b / (norm_a · norm_b)` is
  * engine-portable bit-for-bit (two double multiplies and one divide on
  * an exact integer; no float accumulation order to disagree on).
  *
  * Overflow posture: each term is at most 127·127 and the sum of d terms
  * fits a long for any d below 5.7e14 elements — unreachable.
  * Null on either side yields null; length mismatch truncates to the
  * shorter side, matching [[VecDot]] / zip_with.
  */
case class VecDotI8(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot_i8 requires BINARY inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot_i8"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var acc = 0L
    var i = 0
    while (i < n) { acc += x(i).toLong * y(i).toLong; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) $a[$i] * (long) $b[$i];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotI8 =
    copy(left = newLeft, right = newRight)
}

object VecDotI8 {
  val info = new ExpressionInfo(classOf[VecDotI8].getName, "vec_dot_i8")
}
