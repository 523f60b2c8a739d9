package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plan-audit metadata declared NEXT TO a query's registration, so the
  * registration and its scale-discipline excuse live (and are reviewed)
  * together — PlanAuditSpec consumes these instead of a hand-extended
  * name list inside the spec, and FAILS when a tag goes stale (a `bnlj`
  * tag on a query whose executed plan no longer contains a
  * BroadcastNestedLoopJoin) or names an unregistered query.
  *
  * Exactly one field should normally be set per concern:
  *  - `bnlj`: why this plan legitimately contains a
  *    BroadcastNestedLoopJoin (bounded broadcast side: a query set, a
  *    centroid table, or a ONE-ROW aggregate attach);
  *  - `exhaustiveSibling`: this query is a DELIBERATE super-linear
  *    baseline kept as the correctness yardstick for the named
  *    registered scale-path sibling;
  *  - `blockKnob`: the join is quadratic WITHIN blocks whose count is
  *    the named scale knob growing with N (cells, bands, sig-prefixes).
  */
final case class PlanTag(
    bnlj: Option[String] = None,
    exhaustiveSibling: Option[String] = None,
    blockKnob: Option[String] = None)

/** One group of driver-verifiable operators: Spark queries plus their
  * DuckDB oracle SQL (keys must match; oracles may omit keys for ops that
  * are not SQL-expressible — the driver then records a rows-only check).
  */
trait OpsModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]

  /** Plan-audit tags for THIS module's queries; every key must be a key
    * of [[queries]] (PlanAuditSpec enforces it). */
  def planTags: Map[String, PlanTag] = Map.empty
}
