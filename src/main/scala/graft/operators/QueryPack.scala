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

  /** `sql.replaceChecked(pattern, value)` — a `replace` that FAILS at
    * class-init (and thus in every test run) if `pattern` does not occur
    * in `sql`. The oracle strings wire their literals (window widths,
    * shard counts, mix exponents) to the operators' shared constants via
    * textual substitution; a silent no-op replace — e.g. a reformat of
    * the SQL literal dropping the placeholder — would decouple the oracle
    * from the operator default, exactly the drift the substitution exists
    * to prevent. Loud beats latent.
    */
  protected implicit class OracleSqlOps(private val sql: String) {
    def replaceChecked(pattern: String, value: String): String = {
      require(sql.contains(pattern),
        s"oracle constant-substitution pattern not found: '$pattern' — " +
          "the SQL literal drifted from the shared-constant wiring")
      sql.replace(pattern, value)
    }
  }

  /** Names in [[queries]] whose builder runs a real StreamingQuery when the
    * frame is built (not just declared). Registry-wide specs that build
    * every frame (e.g. the dump-schema decimal gate) consult this instead
    * of a hardcoded name list, so a renamed/added streaming query can't
    * silently run ~seconds of micro-batches inside a schema test or escape
    * the gate via a stale skip entry. Must be a subset of `queries.keySet`
    * (asserted in SparkEntrySpec).
    */
  def streamingQueries: Set[String] = Set.empty
}
