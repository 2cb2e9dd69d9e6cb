package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Join family + set operations over the TPC-H-ish tables.
  *
  * The reference implements no hand-written join, but its flagship hw5 query
  * compiles into a null-safe LeftAnti join (homework-5/README.md:395-407) and
  * "same query capabilities" on a SQL engine implies the standard join family
  * (SURVEY.md §2.3). All joins are declarative one-liners: Catalyst picks
  * broadcast vs shuffle strategies; `broadcast()` hints mark the genuinely
  * small dimension sides so the 100 TB plan stays shuffle-free on them.
  */
object JoinsPack extends QueryPack {

  /** Fact-to-fact equi-join chain + aggregation: revenue per market segment.
    * lineitem⋈orders shuffles on the orderkey; customer is broadcast-sized
    * relative to the facts at any SF (dims scale slower than facts).
    */
  def joinInner(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      // price×discount leaves the cent grid, so round(sum,2) can land on a
      // half-boundary and diverge from the oracle's binary rounding; compute
      // exactly in integer 1e-4 dollars, then one deterministic division.
      .agg(
        (sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100) - round(col("l_discount") * 100).cast("long"))) / 10000.0)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("c_mktsegment"))

  /** Left outer join preserving customers with zero orders. */
  def joinLeft(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("spend"))
      .orderBy(col("c_custkey"))

  /** Left-semi join: customers with at least one finished order (EXISTS). */
  def joinSemi(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(
        t(spark, dir, "orders").filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** Left-anti join: customers with no orders at all (NOT EXISTS). */
  def joinAnti(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Full outer join: order count per nation key from two fact-derived
    * sides, keeping keys present on either side only.
    */
  def joinFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val f = t(spark, dir, "orders").filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("fk")).agg(count(lit(1)).as("n_f"))
    val o = t(spark, dir, "orders").filter(col("o_orderstatus") === "O")
      .groupBy(col("o_custkey").as("ok")).agg(count(lit(1)).as("n_o"))
    f.join(o, col("fk") === col("ok"), "full_outer")
      .select(coalesce(col("fk"), col("ok")).as("custkey"),
        coalesce(col("n_f"), lit(0L)).as("n_f"),
        coalesce(col("n_o"), lit(0L)).as("n_o"))
      .orderBy(col("custkey"))
  }

  /** Right outer join (mirror of joinLeft, dim side preserved). */
  def joinRight(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"), "right")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))

  /** Explicit broadcast of the two genuinely-small dims (nation 25 rows,
    * region 5 rows at every SF) — no shuffle on the probe side.
    */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      // avg on cent-grid values divided by small counts hits exact half-cent
      // boundaries (observed at sf0.001: 4201.315 → .32 vs .31 across
      // engines); keep the average in exact integer cents with floor.
      .agg(
        count(lit(1)).as("n_customers"),
        floor(sum(round(col("c_acctbal") * 100).cast("long")) / count(lit(1)))
          .as("avg_bal_cents"))
      .orderBy(col("r_name"), col("n_name"))

  /** Cross join of the two tiny dims (125 rows — bounded at any SF). */
  def crossSmall(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "region").select(col("r_name"))
      .crossJoin(t(spark, dir, "nation").select(col("n_name")))
      .orderBy(col("r_name"), col("n_name"))

  /** UNION ALL of differently-sourced keys (bag semantics). */
  def unionAll(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer").select(lit("c").as("src"), col("c_custkey").as("key"))
      .unionAll(t(spark, dir, "supplier").select(lit("s").as("src"), col("s_suppkey").as("key")))
      .orderBy(col("src"), col("key"))

  /** UNION DISTINCT (set semantics — Catalyst rewrites to Aggregate). */
  def unionDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer").select(col("c_nationkey").as("nk"))
      .union(t(spark, dir, "supplier").select(col("s_nationkey").as("nk")))
      .distinct()
      .orderBy(col("nk"))

  /** INTERSECT → left-semi join rewrite (mirror of the hw5 EXCEPT study). */
  def intersectKeys(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  /** EXCEPT → left-anti join rewrite on fact-derived keys. */
  def exceptKeys(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .except(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  val queries = Map(
    "q20_join_inner" -> joinInner _,
    "q21_join_left" -> joinLeft _,
    "q22_join_semi" -> joinSemi _,
    "q23_join_anti" -> joinAnti _,
    "q24_join_broadcast" -> joinBroadcast _,
    "q18_join_full_outer" -> joinFullOuter _,
    "q19_join_right" -> joinRight _,
    "q25_cross_dims" -> crossSmall _,
    "q26_union_all" -> unionAll _,
    "q27_union_distinct" -> unionDistinct _,
    "q28_intersect" -> intersectKeys _,
    "q29_except" -> exceptKeys _)

  val oracle = Map(
    "q20_join_inner" ->
      """SELECT c_mktsegment,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q21_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0), 2) AS spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q22_join_semi" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q23_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q18_join_full_outer" ->
      """SELECT coalesce(f.fk, o.ok) AS custkey,
        |  coalesce(f.n_f, 0) AS n_f, coalesce(o.n_o, 0) AS n_o
        |FROM (SELECT o_custkey AS fk, count(*) AS n_f FROM orders
        |      WHERE o_orderstatus = 'F' GROUP BY 1) f
        |FULL OUTER JOIN
        |     (SELECT o_custkey AS ok, count(*) AS n_o FROM orders
        |      WHERE o_orderstatus = 'O' GROUP BY 1) o
        |  ON f.fk = o.ok
        |ORDER BY custkey""".stripMargin,
    "q19_join_right" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q24_join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  CAST(floor(sum(CAST(round(c_acctbal * 100) AS BIGINT)) / count(*))
        |       AS BIGINT) AS avg_bal_cents
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q25_cross_dims" ->
      """SELECT r_name, n_name FROM (SELECT r_name FROM region) r
        |CROSS JOIN (SELECT n_name FROM nation) n
        |ORDER BY r_name, n_name""".stripMargin,
    "q26_union_all" ->
      """SELECT 'c' AS src, c_custkey AS key FROM customer
        |UNION ALL SELECT 's' AS src, s_suppkey AS key FROM supplier
        |ORDER BY src, key""".stripMargin,
    "q27_union_distinct" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,
    "q28_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
    "q29_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin)
}
