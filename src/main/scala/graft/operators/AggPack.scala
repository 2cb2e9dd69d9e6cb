package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Aggregation surface beyond the hw1 rollup: DISTINCT (the hw5
  * ReplaceDistinctWithAggregate subject, homework-5/README.md:410-422),
  * multi-dimensional CUBE/ROLLUP, exact + approximate distinct counts, and
  * global top-k (TakeOrderedAndProject — no full sort at scale).
  */
object AggPack extends QueryPack {

  /** DISTINCT → Aggregate (partial+final HashAggregate at the physical
    * layer, README.md:724-731).
    */
  def distinctFlags(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** CUBE over two dimensions — map-side partial aggregation expands the
    * grouping sets before the single shuffle.
    */
  def cubeFlags(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** ROLLUP (hierarchical subset of CUBE). */
  def rollupFlags(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_extendedprice")), 2).as("sum_price"), count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** Exact multi-column COUNT(DISTINCT) — Catalyst plans the expand +
    * two-phase aggregate.
    */
  def countDistincts(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** HyperLogLog++ approximate distinct — the scale path when exact
    * distinct's shuffle is the bottleneck. No DuckDB oracle (different
    * sketch); correctness bounded vs exact in AggSpec.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .orderBy(col("l_returnflag"))

  /** Global top-k: orderBy+limit compiles to TakeOrderedAndProject — per-
    * partition heaps + driver merge, never a global sort (SURVEY.md §2.6).
    */
  def topkOrders(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** GROUPING SETS — the general form cube/rollup specialize. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /** Salted two-phase aggregation — the skew pattern: low-cardinality hot
    * keys are first split across `nSalts` sub-keys (partial aggregation
    * spreads over the cluster), then merged. Result is identical to the
    * direct group-by (same oracle shape as q31's totals), so the oracle
    * proves the rewrite is semantics-preserving.
    */
  def saltedAgg(spark: SparkSession, dir: String, nSalts: Int = 16): DataFrame =
    t(spark, dir, "lineitem")
      .withColumn("salt", pmod(xxhash64(col("l_orderkey")), lit(nSalts)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(round(sum(col("l_quantity")), 2).as("part_qty"), count(lit(1)).as("part_n"))
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("part_qty")), 2).as("sum_qty"), sum(col("part_n")).as("n"))
      .orderBy(col("l_returnflag"))

  val queries = Map(
    "q30_distinct" -> distinctFlags _,
    "q43_grouping_sets" -> groupingSets _,
    "q44_salted_agg" -> ((s: SparkSession, d: String) => saltedAgg(s, d)),
    "q31_cube" -> cubeFlags _,
    "q32_rollup" -> rollupFlags _,
    "q33_count_distinct" -> countDistincts _,
    "q34_approx_distinct" -> approxDistinct _,
    "q35_topk" -> topkOrders _)

  val oracle = Map(
    "q43_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q44_salted_agg" ->
      // the oracle is the UNSALTED direct aggregation — proves the salted
      // two-phase rewrite is semantics-preserving
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q30_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q31_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q32_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q33_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // q34_approx_distinct: intentionally no oracle (engine-specific sketch)
    "q35_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)
}
