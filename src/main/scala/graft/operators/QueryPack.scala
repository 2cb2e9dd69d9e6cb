package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-checkable queries.
  *
  * Each entry in [[queries]] is a `(SparkSession, sfDir) => DataFrame`; each
  * SQL-expressible entry has a matching DuckDB oracle in [[oracle]] keyed by
  * the same name (driver contract — see SparkEntry). Column names MUST match
  * between the Spark result and the oracle SQL; every result is
  * deterministically ordered so row-order-sensitive comparison also passes.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
