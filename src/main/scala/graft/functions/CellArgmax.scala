package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid argmax as ONE per-row expression (r12 optimization):
  * `cell_argmax(emb, cents)` scans a collected centroid table
  * `cents: ARRAY<STRUCT<cell, cemb: ARRAY<DOUBLE>>>` and returns
  * `STRUCT<cell, ccos: DOUBLE>` — the cell with the maximum cosine to
  * `emb`, ties to the LOWEST cell id.
  *
  * This replaces the Lloyd-assign shape `crossJoin(broadcast(cents)) →
  * groupBy(vec_id).agg(max(struct(cos, -cell)))`, which (a) materializes
  * an N×|cells| row blowout between codegen stages, (b) pays a full
  * corpus Exchange for the re-group (the rows leave the map side as one
  * combined row per vector, but the shuffle + (Sort)Aggregate machinery
  * still runs over all N), and (c) plans the final argmax as a
  * SORT-based aggregate, because a `max(struct(...))` buffer is not
  * hash-aggregable. As an expression the same N·|cells|·dims flops run
  * inside whole-stage codegen with ZERO exchanges — at 100 TB that is
  * one fewer full-corpus shuffle per Lloyd iteration / routing level
  * (guide §2.4 "remove shuffles outright").
  *
  * EXACT-equivalence contract with the historical plan (oracle hashes
  * must not move):
  *  - cosine = vec_dot(emb,cemb) / (sqrt(vec_dot(emb,emb)) *
  *    sqrt(vec_dot(cemb,cemb))), the same left-to-right folds — the
  *    emb-norm hoist is value-identical, sqrt/division ordering is the
  *    [[graft.sim.Embeddings.cosine]] composition exactly;
  *  - the argmax replicates `max(struct(s, -cell))`'s ordering: doubles
  *    compare NaN-greatest / NaN==NaN / ==-first (-0.0 equals 0.0), the
  *    same org.apache.spark.util.Utils.nanSafeCompareDoubles rule the
  *    struct ordering uses, with ties resolved to the lowest cell id;
  *  - an EMPTY centroid array yields NULL (callers filter it away,
  *    matching the historical cross-join-with-empty → zero rows).
  *
  * The `cell` field keeps whatever integral type the centroid frame
  * carries (int or long), so downstream schemas are unchanged. Like
  * [[VecDot]], vectors are dense — null ELEMENTS are not checked.
  */
case class CellArgmax(left: Expression, right: Expression)
    extends BinaryExpression {

  private def centsType: ArrayType = right.dataType.asInstanceOf[ArrayType]
  private def centStruct: StructType =
    centsType.elementType.asInstanceOf[StructType]
  private def cellType: DataType = centStruct.fields(0).dataType
  private def cellIsLong: Boolean = cellType == LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    val okLeft = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val okRight = right.dataType match {
      case ArrayType(StructType(Array(f0, f1)), _) =>
        (f0.dataType == LongType || f0.dataType == IntegerType) &&
          (f1.dataType match {
            case ArrayType(DoubleType, _) => true
            case _ => false
          })
      case _ => false
    }
    if (okLeft && okRight) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "cell_argmax requires (ARRAY<DOUBLE>, ARRAY<STRUCT<cell: INT|LONG, " +
        s"cemb: ARRAY<DOUBLE>>>), got ${left.dataType.catalogString} and " +
        right.dataType.catalogString)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cell", cellType, nullable = false),
    StructField("ccos", DoubleType, nullable = false)))

  override def prettyName: String = "cell_argmax"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val emb = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val m = cents.numElements()
    if (m == 0) return null
    val d = emb.numElements()
    var ee = 0.0
    var i = 0
    while (i < d) { val v = emb.getDouble(i); ee += v * v; i += 1 }
    val embNorm = math.sqrt(ee)
    var bestCell = 0L
    var bestCos = 0.0
    var first = true
    var c = 0
    while (c < m) {
      val row = cents.getStruct(c, 2)
      val cell = if (cellIsLong) row.getLong(0) else row.getInt(0).toLong
      val cemb = row.getArray(1)
      val n = math.min(d, cemb.numElements())
      var dot = 0.0
      var cc = 0.0
      var j = 0
      while (j < n) {
        val cv = cemb.getDouble(j)
        dot += emb.getDouble(j) * cv
        j += 1
      }
      j = 0
      val nc = cemb.numElements()
      while (j < nc) { val cv = cemb.getDouble(j); cc += cv * cv; j += 1 }
      val s = dot / (embNorm * math.sqrt(cc))
      // nanSafeCompareDoubles(s, bestCos) > 0 || (== 0 && cell < bestCell)
      val cmp =
        if (s == bestCos) 0
        else if (java.lang.Double.isNaN(s) && java.lang.Double.isNaN(bestCos)) 0
        else if (java.lang.Double.isNaN(s)) 1
        else if (java.lang.Double.isNaN(bestCos)) -1
        else if (s > bestCos) 1 else -1
      if (first || cmp > 0 || (cmp == 0 && cell < bestCell)) {
        bestCos = s; bestCell = cell; first = false
      }
      c += 1
    }
    val out = new GenericInternalRow(2)
    if (cellIsLong) out.setLong(0, bestCell) else out.setInt(0, bestCell.toInt)
    out.setDouble(1, bestCos)
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val d = ctx.freshName("d")
      val ee = ctx.freshName("ee")
      val embNorm = ctx.freshName("embNorm")
      val bestCell = ctx.freshName("bestCell")
      val bestCos = ctx.freshName("bestCos")
      val firstFlag = ctx.freshName("first")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val row = ctx.freshName("row")
      val cell = ctx.freshName("cell")
      val cemb = ctx.freshName("cemb")
      val n = ctx.freshName("n")
      val nc = ctx.freshName("nc")
      val dotv = ctx.freshName("dot")
      val ccv = ctx.freshName("cc")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val cmp = ctx.freshName("cmp")
      val out = ctx.freshName("out")
      val ev1 = ctx.freshName("ev1")
      val cv1 = ctx.freshName("cv1")
      val getCell =
        if (cellIsLong) s"$row.getLong(0)" else s"(long) $row.getInt(0)"
      val setCell =
        if (cellIsLong) s"$out.setLong(0, $bestCell);"
        else s"$out.setInt(0, (int) $bestCell);"
      s"""
         |int $m = $b.numElements();
         |if ($m == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $d = $a.numElements();
         |  double $ee = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    double $ev1 = $a.getDouble($i); $ee += $ev1 * $ev1;
         |  }
         |  double $embNorm = java.lang.Math.sqrt($ee);
         |  long $bestCell = 0L;
         |  double $bestCos = 0.0;
         |  boolean $firstFlag = true;
         |  for (int $c = 0; $c < $m; $c++) {
         |    InternalRow $row = $b.getStruct($c, 2);
         |    long $cell = $getCell;
         |    ArrayData $cemb = $row.getArray(1);
         |    int $n = java.lang.Math.min($d, $cemb.numElements());
         |    int $nc = $cemb.numElements();
         |    double $dotv = 0.0;
         |    double $ccv = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $dotv += $a.getDouble($j) * $cemb.getDouble($j);
         |    }
         |    for (int $j = 0; $j < $nc; $j++) {
         |      double $cv1 = $cemb.getDouble($j); $ccv += $cv1 * $cv1;
         |    }
         |    double $s = $dotv / ($embNorm * java.lang.Math.sqrt($ccv));
         |    int $cmp;
         |    if ($s == $bestCos) $cmp = 0;
         |    else if (java.lang.Double.isNaN($s) && java.lang.Double.isNaN($bestCos)) $cmp = 0;
         |    else if (java.lang.Double.isNaN($s)) $cmp = 1;
         |    else if (java.lang.Double.isNaN($bestCos)) $cmp = -1;
         |    else $cmp = ($s > $bestCos) ? 1 : -1;
         |    if ($firstFlag || $cmp > 0 || ($cmp == 0 && $cell < $bestCell)) {
         |      $bestCos = $s; $bestCell = $cell; $firstFlag = false;
         |    }
         |  }
         |  org.apache.spark.sql.catalyst.expressions.GenericInternalRow $out =
         |    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2);
         |  $setCell
         |  $out.setDouble(1, $bestCos);
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CellArgmax =
    copy(left = newLeft, right = newRight)
}

object CellArgmax {
  val info = new ExpressionInfo(classOf[CellArgmax].getName, "cell_argmax")
}
