package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `topk_by(id, score, k)` — the k best (id, score) pairs per group,
  * ordered score DESC (NaN greatest, the SQL double order) with ties to
  * the LOWEST id: exactly the `row_number() OVER (ORDER BY score DESC,
  * id ASC) <= k` window contract, as a k-BOUNDED native aggregation
  * state (r12 optimization).
  *
  * Why it matters at 100 TB: the window formulation shuffles and sorts
  * EVERY candidate row per group — for a top-k over a pair join the
  * exchange carries the whole candidate fan-out. This aggregate keeps at
  * most k entries per group per partition in the partial pass, so the
  * exchange ships ≤ k rows per group per partition regardless of
  * candidate volume, and nothing is ever sorted beyond k elements — the
  * [[BoundedDistinct]] / [[KMinValues]] bounded-partial-state argument
  * applied to ranked retrieval. A skewed block (one candidate key owning
  * most pairs) stops mattering: its pairs partial-reduce wherever they
  * were produced instead of converging on one sort task.
  *
  * Determinism: (score, id) is a strict total order when ids are unique
  * per group (every caller ranks distinct neighbor ids), so membership
  * and order of the k best are set properties — merge order cannot
  * change them. The emitted array is sorted best-first; `posexplode`
  * recovers the rank. Double comparison replicates the SQL ordering
  * (nanSafeCompareDoubles: NaN greatest, NaN == NaN, -0.0 == 0.0).
  */
case class TopKByScore(
    idExpr: Expression,
    scoreExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  /** Best-first: higher score first (NaN greatest), then lower id. */
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = -nanSafe(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }
  private def nanSafe(x: Double, y: Double): Int =
    if ((java.lang.Double.isNaN(x) && java.lang.Double.isNaN(y)) || x == y) 0
    else if (java.lang.Double.isNaN(x)) 1
    else if (java.lang.Double.isNaN(y)) -1
    else if (x > y) 1 else -1

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_by"

  override def checkInputDataTypes(): TypeCheckResult =
    if (idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by requires BIGINT id, got ${idExpr.dataType.catalogString}")
    else if (scoreExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by requires DOUBLE score, got ${scoreExpr.dataType.catalogString}")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType ||
        kExpr.eval() == null)
      TypeCheckResult.TypeCheckFailure("k must be a non-null INTEGER literal")
    else if (kExpr.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckResult.TypeCheckFailure("k must be positive")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](ord)

  override def update(buf: java.util.TreeSet[(Double, Long)],
                      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val idv = idExpr.eval(input)
    val sv = scoreExpr.eval(input)
    if (idv != null && sv != null) {
      val cand = (sv.asInstanceOf[Double], idv.asInstanceOf[Long])
      if (buf.size < k) buf.add(cand)
      else if (ord.compare(cand, buf.last()) < 0) {
        buf.add(cand)
        buf.pollLast()
      }
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[(Double, Long)],
                     b2: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    val it = b2.iterator()
    while (it.hasNext) {
      b1.add(it.next())
      if (b1.size > k) b1.pollLast()
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val (s, id) = it.next()
      val row = new GenericInternalRow(2)
      row.setLong(0, id)
      row.setDouble(1, s)
      arr(i) = row
      i += 1
    }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (s, id) = it.next()
      out.writeDouble(s); out.writeLong(id)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new java.util.TreeSet[(Double, Long)](ord)
    val n = in.readInt()
    var i = 0
    while (i < n) { val s = in.readDouble(); val id = in.readLong(); buf.add((s, id)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1),
      kExpr = newChildren(2))
}

object TopKByScore {
  val info = new ExpressionInfo(classOf[TopKByScore].getName, "topk_by")
}
