package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator pack's named queries + DuckDB oracles. Each pack
  * maps one reference capability family (SURVEY.md §2) to idiomatic Spark.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    TrafficPack,
    RelationalPack,
    JoinsPack,
    AggPack,
    WindowPack,
    InvertedIndexPack,
    WideColumnPack,
    LookupPack,
    EventsPack,
    AsOfPack,
    TextPack,
    DedupPack,
    SimilarityPack,
    MultimodalPack)

  /** Pack list, visible to the registry-hygiene spec (duplicate-name and
    * orphan-oracle detection across the flatten).
    */
  private[graft] def allPacks: Seq[QueryPack] = packs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TrafficPack.trafficRollup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Lazy val, not
    * def: `BenchUtil.execNoop` looks a query up per timed sample, and
    * re-flattening 14 packs inside the measured window is pure waste.
    */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
