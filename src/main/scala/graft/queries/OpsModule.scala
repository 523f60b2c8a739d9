package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One group of driver-verifiable operators: Spark queries plus their
  * DuckDB oracle SQL (keys must match; oracles may omit keys for ops that
  * are not SQL-expressible — the driver then records a rows-only check).
  */
trait OpsModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
