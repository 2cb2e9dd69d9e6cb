package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** hw1 pack — Hadoop-MapReduce batch aggregation re-expressed as a Spark
  * group-by.
  *
  * Reference semantics (homework-1/src/main/java/.../MyMapper.java:23-31 +
  * MyReduce.java:21-31): per record key, three parallel sums — sum(up),
  * sum(down), sum(up+down). Here the record key is `l_orderkey` and the two
  * metrics are `l_quantity` / `l_extendedprice`; the map-side combine the old
  * `mapred` API got from its combiner is Spark's partial HashAggregate, and
  * the shuffle-by-key is the Exchange under it.
  */
object TrafficPack extends QueryPack {

  /** Literal hw1 pipeline: TSV lines → (key, up, down) by position → per-key
    * sums. Positions mirror MyMapper.java:23-29 (field 1 = key, fields 7/8 =
    * up/down flow); output shape mirrors MyReduce.java:30 (key, up, down,
    * total). Schema applied at read so the parse is pushed into the scan.
    */
  def tsvTraffic(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").csv(path)
      .select(
        col("_c1").as("phone"),
        col("_c7").cast("long").as("up"),
        col("_c8").cast("long").as("down"))
      .groupBy(col("phone"))
      .agg(
        sum(col("up")).as("sum_up"),
        sum(col("down")).as("sum_down"),
        sum(col("up") + col("down")).as("sum_total"))
      .orderBy(col("phone"))

  /** Per-key 3-way sum rollup (MyReduce.java:23-30 shape). */
  def trafficRollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .groupBy(col("l_orderkey"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_up"),
        round(sum(col("l_extendedprice")), 2).as("sum_down"),
        round(sum(col("l_quantity") + col("l_extendedprice")), 2).as("sum_total"))
      .orderBy(col("l_orderkey"))

  /** Global rollup across all keys (the classic total-traffic footer). */
  def trafficTotal(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 2).as("sum_up"),
        round(sum(col("l_extendedprice")), 2).as("sum_down"))

  /** Exact money aggregation in DECIMAL(18,2) — the type-system answer to
    * float-sum nondeterminism: decimal addition is exact and associative,
    * so ANY partial-aggregation order gives the same result. The REPORTED
    * value is the exact sum in integer CENTS (no decimal may reach a dump
    * schema: pyarrow surfaces parquet decimals with declared-scale
    * trailing zeros while the oracle side surfaces floats — a sum landing
    * on a 10¢ boundary would hash-mismatch on identical values). Bigint
    * cents, not double: a double report diverges once the cent sum passes
    * 2^53 (~9e13 dollars — DuckDB's int128 decimal→double takes two
    * roundings to Spark's one), while decimal(·,2)→cents→int64 stays
    * exact to ~9e16 dollars per group, far past any 100 TB rollup.
    */
  def decimalAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg((sum(col("l_extendedprice").cast("decimal(18,2)")) * 100)
        .cast("long").as("sum_price_cents"))
      .orderBy(col("l_returnflag"))

  /** The reference's literal output shape: key + tab-joined "%d\t%d\t%d"
    * value line (MyReduce.java:30) — format_string over integer-quantity
    * sums.
    */
  def formattedOutput(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(
        sum(col("l_quantity").cast("long")).as("up"),
        sum(col("l_linenumber").cast("long")).as("down"))
      .select(col("l_orderkey"),
        format_string("%d\t%d\t%d", col("up"), col("down"), col("up") + col("down"))
          .as("line"))
      .orderBy(col("l_orderkey"))

  val queries = Map(
    "q01_traffic_rollup" -> trafficRollup _,
    "q02_traffic_total" -> trafficTotal _,
    "q03_decimal_agg" -> decimalAgg _,
    "q04_formatted_output" -> formattedOutput _)

  val oracle = Map(
    "q01_traffic_rollup" ->
      """SELECT l_orderkey,
        |  round(sum(l_quantity), 2) AS sum_up,
        |  round(sum(l_extendedprice), 2) AS sum_down,
        |  round(sum(l_quantity + l_extendedprice), 2) AS sum_total
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q02_traffic_total" ->
      """SELECT count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_up,
        |  round(sum(l_extendedprice), 2) AS sum_down
        |FROM lineitem""".stripMargin,
    "q03_decimal_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS sum_price_cents
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q04_formatted_output" ->
      // DuckDB literals don't process \t — chr(9) builds the real tab
      """SELECT l_orderkey,
        |  CAST(up AS VARCHAR) || chr(9) || CAST(down AS VARCHAR) || chr(9)
        |    || CAST(up + down AS VARCHAR) AS line
        |FROM (SELECT l_orderkey,
        |        CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS up,
        |        CAST(sum(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS down
        |      FROM lineitem GROUP BY l_orderkey) t
        |ORDER BY l_orderkey""".stripMargin)
}
