package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `vec_avg(emb)` — element-wise mean of dense double vectors as ONE
  * native aggregation (r12 optimization): buffer = per-dim running sums
  * + per-dim non-null counts, output = `ARRAY<DOUBLE>` of `sum/count`
  * per dim.
  *
  * This replaces the centroid shape `posexplode(emb) → groupBy(cell,
  * idx).avg(v) → groupBy(cell).collect_list → array_sort → transform`,
  * which (a) generates dims× the corpus row count between the scan and
  * the first aggregate, and (b) pays TWO exchanges per centroid pass
  * (keyed (cell, idx), then (cell)). The aggregate ships one
  * |cells|-row partial per partition (each a dims-wide sums array) —
  * at 100 TB one fewer full-width exchange and no row blowout per
  * Lloyd iteration / centroid derivation (guide §2.3 "aggregate before
  * you shuffle").
  *
  * EXACT-equivalence contract with the explode form (oracle hashes must
  * not move): per dim, partial sums accumulate in row order within a
  * partition and merge in shuffle-fetch order — the identical partial /
  * merge structure `avg(v)` has per (cell, idx) key — and the final
  * division is the same `sum / count` double op. NULL vector rows are
  * skipped (posexplode emits nothing); a null ELEMENT is skipped per
  * dim with its own count, matching avg's null-skipping per (cell,
  * idx) group. Ragged lengths accumulate per dim exactly like the
  * explode form; dims whose count is zero cannot arise from it (an
  * element either exists in some row or no (cell, idx) group forms),
  * and the output is truncated to the longest seen vector, matching.
  */
case class VecAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecAvg.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_avg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_avg requires ARRAY<DOUBLE> input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): VecAvg.Buf = new VecAvg.Buf

  override def update(buf: VecAvg.Buf, input: InternalRow): VecAvg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      buf.ensure(n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          buf.sums(i) += arr.getDouble(i)
          buf.counts(i) += 1L
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: VecAvg.Buf, b2: VecAvg.Buf): VecAvg.Buf = {
    b1.ensure(b2.dims)
    var i = 0
    while (i < b2.dims) {
      b1.sums(i) += b2.sums(i)
      b1.counts(i) += b2.counts(i)
      i += 1
    }
    b1
  }

  override def eval(buf: VecAvg.Buf): Any = {
    if (buf.dims == 0) return null
    val out = new Array[Any](buf.dims)
    var i = 0
    while (i < buf.dims) {
      // same double op as Average's evaluate: sum / count
      out(i) = buf.sums(i) / buf.counts(i).toDouble
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: VecAvg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.dims)
    var i = 0
    while (i < buf.dims) {
      out.writeDouble(buf.sums(i)); out.writeLong(buf.counts(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecAvg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new VecAvg.Buf
    val n = in.readInt()
    buf.ensure(n)
    var i = 0
    while (i < n) { buf.sums(i) = in.readDouble(); buf.counts(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecAvg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecAvg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecAvg =
    copy(child = newChildren(0))
}

object VecAvg {
  /** Growable per-dim (sum, count) accumulator. */
  final class Buf {
    var dims: Int = 0
    var sums: Array[Double] = Array.emptyDoubleArray
    var counts: Array[Long] = Array.emptyLongArray
    def ensure(n: Int): Unit = if (n > dims) {
      sums = java.util.Arrays.copyOf(sums, n)
      counts = java.util.Arrays.copyOf(counts, n)
      dims = n
    }
  }
  val info = new ExpressionInfo(classOf[VecAvg].getName, "vec_avg")
}
