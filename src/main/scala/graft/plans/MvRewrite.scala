package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-aggregate (materialized-view) rewrite — the lakehouse
  * optimizer feature that makes summary marts TRANSPARENT: a query
  * aggregating the base table is rerouted to a pre-aggregated summary
  * when the summary can answer it, without the query author knowing the
  * summary exists. Together with [[graft.streaming.AggSink]] (which
  * MAINTAINS such summaries exactly-once from a stream) this closes the
  * loop: ingest keeps the mart fresh, the rewrite serves reads from it.
  *
  * Scope (deliberately conservative — a rewrite must NEVER change
  * answers):
  *  - the aggregate's child must be the registered base relation (bare
  *    scan or attribute-only Project; any Filter/expression disqualifies
  *    — a filtered base cannot be answered from unfiltered partials);
  *  - grouping columns must be attribute refs ⊆ the summary's grouping
  *    (subset rollups re-aggregate: SUM of partial SUMs, COUNT(*)
  *    becomes SUM of the partial count — the standard algebraic-measure
  *    contract; AVG/NTILE etc. do not match and fall through);
  *  - every output is either a grouping passthrough or SUM/COUNT over a
  *    registered measure.
  * Rewritten aliases keep the ORIGINAL exprIds, so parent operators
  * resolve unchanged.
  *
  * At 100 TB this is the difference between scanning the corpus and
  * scanning a |groups|-row mart for every dashboard aggregate; the rule
  * is a no-op (single registry check) when nothing is registered.
  */
object MvRewrite {

  /** A registered summary: answers aggregates over the base relation
    * whose file location contains `baseTag`. `sumCols` maps base column
    * → mv partial-sum column; `countCol` is the mv row-count partial. */
  case class Mv(baseTag: String, groupCols: Set[String],
                sumCols: Map[String, String], countCol: Option[String],
                mvPlan: LogicalPlan)

  private val registry = scala.collection.mutable.ArrayBuffer[Mv]()

  def clear(): Unit = registry.synchronized { registry.clear() }

  def register(mvDf: DataFrame, baseTag: String, groupCols: Seq[String],
               sumCols: Map[String, String],
               countCol: Option[String]): Unit = registry.synchronized {
    registry += Mv(baseTag, groupCols.toSet, sumCols, countCol,
      mvDf.queryExecution.analyzed)
  }

  private def mvs: Seq[Mv] = registry.synchronized { registry.toSeq }

  def ensureRegistered(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(RewriteRule)) {
      spark.experimental.extraOptimizations = cur :+ RewriteRule
    }
  }

  object RewriteRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (mvs.isEmpty) plan
      else plan.transformUp {
        case agg @ Aggregate(groupings, aggExprs, child, _) =>
          baseTagOf(child).flatMap { tag =>
            mvs.find(m => tag.contains(m.baseTag) &&
                canRewrite(m, groupings, aggExprs))
              .map(m => rewrite(m, groupings, aggExprs))
          }.getOrElse(agg)
      }
  }

  /** The scan location when the child is the bare relation (or an
    * attribute-only projection of it); None on anything else. */
  private def baseTagOf(p: LogicalPlan): Option[String] = p match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      baseTagOf(child)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => Some(fs.location.rootPaths.mkString(","))
      case _ => None
    }
    case _ => None
  }

  private def canRewrite(m: Mv, groupings: Seq[Expression],
                         aggExprs: Seq[NamedExpression]): Boolean = {
    val groupsOk = groupings.forall {
      case ar: AttributeReference => m.groupCols.contains(ar.name)
      case _ => false
    }
    groupsOk && aggExprs.forall {
      case ar: AttributeReference => m.groupCols.contains(ar.name)
      case Alias(ae: AggregateExpression, _) if !ae.isDistinct &&
          ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Sum(ar: AttributeReference, _) => m.sumCols.contains(ar.name)
          case _: Count => m.countCol.isDefined
          case _ => false
        }
      case _ => false
    }
  }

  private def rewrite(m: Mv, groupings: Seq[Expression],
                      aggExprs: Seq[NamedExpression]): LogicalPlan = {
    val mvOut = m.mvPlan.output.map(a => a.name -> a).toMap
    val newGroupings = groupings.map {
      case ar: AttributeReference => mvOut(ar.name)
    }
    val newAggExprs: Seq[NamedExpression] = aggExprs.map {
      case ar: AttributeReference =>
        Alias(mvOut(ar.name), ar.name)(exprId = ar.exprId)
      case al @ Alias(ae: AggregateExpression, name) =>
        val partial = ae.aggregateFunction match {
          case Sum(ar: AttributeReference, _) => mvOut(m.sumCols(ar.name))
          case _: Count => mvOut(m.countCol.get)
        }
        Alias(Sum(partial).toAggregateExpression(), name)(exprId = al.exprId)
    }
    Aggregate(newGroupings, newAggExprs, m.mvPlan)
  }
}
