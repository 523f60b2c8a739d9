package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: membership probe of a long key against a
  * serialized `org.apache.spark.util.sketch.BloomFilter` carried as a
  * foldable BINARY argument.
  *
  * This is the scale lever behind [[graft.text.TextOps.decontaminateBloom]]:
  * a benchmark shingle set that is gigabytes as strings is ~10 bits per
  * entry as a Bloom filter (≈120 MB for 10⁸ shingles at 1% fpp), so the
  * corpus-side prefilter ships a sketch, not the set. No false negatives —
  * every true hit survives to the exact confirm join — and false positives
  * only cost a few extra rows in that join, never a wrong answer.
  *
  * Mirrors the design of Spark's internal runtime-filter probe (the
  * filter is deserialized lazily once per task from the foldable child;
  * `doGenCode` pins the deserialized instance into the codegen references
  * so the probe is a single virtual call inside whole-stage codegen).
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires a BIGINT key, got ${left.dataType.catalogString}")
    else if (right.dataType != BinaryType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain requires a foldable BINARY serialized filter")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(
      new ByteArrayInputStream(right.eval(null).asInstanceOf[Array[Byte]]))

  override protected def nullSafeEval(key: Any, bytes: Any): Any =
    bloom.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, (key, _) => s"$bloomRef.mightContainLong($key)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  val info = new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain")

  /** Serialize a built filter for embedding as a `lit(...)` argument. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
