package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.{events, t, tsMillis}

/** Window-function surface. The one reference-derived window semantic is the
  * hw3 maxVersions(3) retention (HBaseClient.java:132-138 →
  * row_number ≤ 3, implemented in WideColumnPack); this pack adds the
  * standard ranking/offset/frame windows over orders/events (SURVEY.md §2.5).
  * Timestamps are projected through unix_millis for oracle parity
  * (FIXTURES.md caveats: events.ts is ns-precision parquet).
  */
object WindowPack extends QueryPack {

  /** Top-3 most recent orders per customer — ranking window, the
    * scale-friendly alternative to a global sort (partition-local heaps
    * after one shuffle on o_custkey).
    */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey"))
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        tsMillis(col("o_orderdate")).as("ts_ms"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** rank + dense_rank with real ties (o_totalprice duplicates). */
  def rankOrders(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice").desc)
    t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .orderBy(col("o_orderpriority"), col("rnk"), col("o_orderkey"))
  }

  /** lag offset window: per-user delta of `value` between consecutive
    * events. Raw doubles are safe to compare: the subtraction is a single
    * deterministic IEEE op on unmodified parquet values.
    */
  def lagDeltas(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"), col("ts"))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .select(col("user_id"), col("event_id"),
        (col("value") - col("prev_value")).as("delta"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Running (cumulative) sum frame — rows between unbounded preceding and
    * current row. Same addition sequence in both engines → bit-identical.
    */
  def runningSum(spark: SparkSession, dir: String): DataFrame = {
    // exact integer cents inside the running fold, ONE deterministic
    // division at the end: a raw double running sum is bit-divergent
    // between engines (Spark accumulates sequentially, DuckDB's windowed
    // SUM aggregates tree-wise — a round-10 bit audit showed 37% of cells
    // differing in the last ulp, green only through compare rounding).
    // `value` is cent-grid data, so round(value*100) is exact and the
    // long cumsum has a single IEEE-identical final /100.0 on both sides.
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(spark, dir)
      .select(col("user_id"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"), col("ts"))
      .withColumn("running_value", sum(col("cents")).over(w) / 100.0)
      .select(col("user_id"), col("event_id"), col("running_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** RANGE-frame window (value-based, vs q39's ROWS frame): 7-day trailing
    * revenue over daily totals. The frame is expressed on integer day
    * numbers (epoch-ms div 86400000 — integer `div`, never `/`, which
    * would go through double) so both engines bound the identical value
    * range; days with no orders correctly DON'T extend the window, which a
    * ROWS frame would get wrong. The global (unpartitioned) window is safe
    * because it runs over the per-day rollup — one row per day regardless
    * of corpus size.
    */
  def movingRevenue(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "orders")
      .select(
        // FLOOR division in pure integer math to match DuckDB's `//`:
        // bare `div` truncates toward zero, which differs for pre-1970
        // (negative-epoch) dates. Subtracting pmod (always non-negative)
        // first makes the dividend an exact multiple, so `div` is the
        // true floor on all inputs — still no float op anywhere.
        expr("""(unix_millis(cast(o_orderdate as timestamp))
                - pmod(unix_millis(cast(o_orderdate as timestamp)), 86400000))
                div 86400000""").as("day"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("day_cents"))
    val w = Window.orderBy(col("day")).rangeBetween(-6, 0)
    daily
      .withColumn("trailing_7d_cents", sum(col("day_cents")).over(w))
      .select(col("day"),
        (col("day_cents") / 100.0).as("day_revenue"),
        (col("trailing_7d_cents") / 100.0).as("trailing_7d_revenue"))
      .orderBy(col("day"))
  }

  /** q36's semantics through the custom TopKPerKeyNode/Exec operator
    * (graft.plans.TopKPerKey): same oracle SHAPE as a row_number window,
    * but the physical plan is one key-clustered exchange into bounded
    * k-row heaps — no partition sort, memory ⊥ group size. The window
    * formulation (q36) stays as the built-in reference; TopKPerKeySpec
    * asserts row-set equality between the two and that the custom exec
    * actually planned.
    */
  def topkPerKeyNative(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerKey(
        t(spark, dir, "lineitem")
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice")),
        Seq("l_returnflag"),
        Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")),
        k = 3)
      .orderBy(col("l_returnflag"), col("l_extendedprice").desc,
        col("l_orderkey"), col("l_linenumber"))

  /** Distribution + navigation window functions in one pass — the rest of
    * the standard window surface: ntile quartiles, percent_rank, cume_dist
    * (rank fractions: single integer divisions, identical IEEE op on both
    * engines), first/last value over an explicit whole-partition ROWS
    * frame (the default frame differs between engines — spell it out), and
    * lead. The ordering key (o_totalprice, o_orderkey) is unique, so every
    * function is deterministic.
    */
  def windowDistribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .withColumn("first_key", first(col("o_orderkey")).over(wf))
      .withColumn("last_key", last(col("o_orderkey")).over(wf))
      .withColumn("next_key", lead(col("o_orderkey"), 1).over(w))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  val queries = Map(
    "q129_window_distribution" -> windowDistribution _,
    "q90_window_range_frame" -> movingRevenue _,
    "q119_topk_per_key_native" -> topkPerKeyNative _,
    "q36_window_topn" -> topOrdersPerCustomer _,
    "q37_window_rank" -> rankOrders _,
    "q38_window_lag" -> lagDeltas _,
    "q39_window_running" -> runningSum _)

  val oracle = Map(
    "q129_window_distribution" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  first_value(o_orderkey) OVER wf AS first_key,
        |  last_value(o_orderkey) OVER wf AS last_key,
        |  lead(o_orderkey, 1) OVER w AS next_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey),
        |  wf AS (PARTITION BY o_orderpriority
        |         ORDER BY o_totalprice, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q119_topk_per_key_native" ->
      // the custom heap operator must agree with the canonical window form
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 3
        |ORDER BY l_returnflag, l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin,
    "q90_window_range_frame" ->
      """WITH daily AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS day_cents
        |  FROM orders GROUP BY 1)
        |SELECT day, day_cents / 100.0 AS day_revenue,
        |  CAST(sum(day_cents) OVER (ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0
        |    AS trailing_7d_revenue
        |FROM daily ORDER BY day""".stripMargin,
    "q36_window_topn" ->
      """SELECT o_custkey, rn, o_orderkey, epoch_ms(o_orderdate) AS ts_ms FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q37_window_rank" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rnk, drnk FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk,
        |    dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS drnk
        |  FROM orders) t
        |WHERE rnk <= 5 ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin,
    "q38_window_lag" ->
      """SELECT user_id, event_id, value - prev_value AS delta FROM (
        |  SELECT user_id, event_id, value,
        |    lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        |  FROM events) t
        |ORDER BY user_id, event_id""".stripMargin,
    "q39_window_running" ->
      """SELECT user_id, event_id,
        |  sum(CAST(round(value * 100) AS BIGINT)) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
        |    AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin)
}
