package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.{ClassicBridge, RangeJoinExec}

/** Logical point-in-interval join node. Pure declaration: which child
  * columns are the equi keys, the point, and the interval bounds. The
  * physical strategy ([[RangeJoinStrategy]]) maps it 1:1 onto
  * [[org.apache.spark.sql.graft.RangeJoinExec]]; distribution/ordering
  * requirements live on the physical side where EnsureRequirements reads
  * them. Constructed only via [[NativeRangeJoin.pointInInterval]], which
  * resolves the expressions against already-analyzed children — so the
  * node never needs analyzer support.
  */
case class RangeJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    point: Expression, lo: Expression, hi: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[RangeJoinPlan]] onto the sweep-merge exec. Injected per
  * session via `spark.experimental.extraStrategies` (runtime, idempotent
  * — see [[NativeRangeJoin.ensureRegistered]]) or at config time via
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinPlan(l, r, lk, rk, p, lo, hi) =>
      RangeJoinExec(lk, rk, p, lo, hi, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Native (whole-operator) range join: the custom-operator ladder's last
  * rung — LogicalPlan + SparkStrategy + SparkPlan — for the one join
  * shape Spark's built-in planner handles badly. Prefer this over
  * graft.ops.RangeJoin's bucketization when an equi key exists (one
  * shuffle per side, no width knob, immune to per-key skew going
  * quadratic: an equi-join + BETWEEN filter on a hot key compares
  * points × intervals, the sweep compares points + intervals + matches).
  * Keyless calls run single-partition — fine for a dimension-sized
  * interval side, wrong for two big sides (use bucketization there).
  */
object NativeRangeJoin {

  /** Register the planner strategy on this session (idempotent).
    * `experimental.extraStrategies` is the public runtime hook for custom
    * strategies; GraftExtensions covers config-time injection.
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(RangeJoinStrategy)) {
      spark.experimental.extraStrategies = cur :+ RangeJoinStrategy
    }
  }

  /** Inner join keeping (point row ++ interval row) for every interval
    * containing the point, inclusive both ends; `keys` pairs equi-key
    * columns as (pointsCol, intervalsCol). Point/lo/hi must share one
    * orderable type, paired keys must match types exactly (they hash to
    * the co-partitioning), and non-key output names must be disjoint.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      keys: Seq[(String, String)] = Nil): DataFrame = {
    val spark = points.sparkSession
    ensureRegistered(spark)
    val lPlan = points.queryExecution.analyzed
    val rPlan = intervals.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"column '$name' not found on the $side side (has: ${plan.output.map(_.name).mkString(", ")})"))
    val p = attr(lPlan, pointCol, "points")
    val lo = attr(rPlan, loCol, "intervals")
    val hi = attr(rPlan, hiCol, "intervals")
    require(p.dataType == lo.dataType && p.dataType == hi.dataType,
      s"point/lo/hi types must match: ${p.dataType} vs ${lo.dataType}/${hi.dataType}")
    val (lk, rk) = keys.map { case (ln, rn) =>
      val a = attr(lPlan, ln, "points"); val b = attr(rPlan, rn, "intervals")
      require(a.dataType == b.dataType,
        s"key types must match for ($ln, $rn): ${a.dataType} vs ${b.dataType}")
      (a, b)
    }.unzip
    ClassicBridge.ofRows(spark, RangeJoinPlan(lPlan, rPlan, lk, rk, p, lo, hi))
  }
}
