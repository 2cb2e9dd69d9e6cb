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

  /** Bag-semantics set ops — EXCEPT ALL / INTERSECT ALL, the multiplicity-
    * preserving duals of q28/q29 (Catalyst rewrites them to a count-based
    * generate, not an anti/semi join: occurrences beyond the matched count
    * survive). Exercised on a multiset that genuinely has duplicates
    * (orders.o_custkey) against each status slice; folded to per-key
    * multiplicities so the output is compact and deterministically
    * ordered. One query, both ops, tagged rows.
    */
  def bagSetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val all = o.select(col("o_custkey"))
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    def fold(df: DataFrame, tag: String) =
      df.groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .select(lit(tag).as("op"), col("o_custkey"), col("n"))
    fold(all.exceptAll(f), "except_all")
      .unionAll(fold(all.intersectAll(f), "intersect_all"))
      .orderBy(col("op"), col("o_custkey"))
  }

  /** Salted equi-join — the hot-key skew treatment for joins (q44 is the
    * aggregation twin): the big side scatters each key across `nSalts`
    * sub-keys, the small side REPLICATES each row once per salt, and the
    * join runs on (key, salt) — a skewed key's rows now spread over
    * nSalts reducers instead of melting one. Replication multiplies the
    * small side nSalts× (why the technique is reserved for dimension-vs-
    * fact skew; AQE's skew splitting is the no-rewrite alternative,
    * spec-proven in AdaptiveSpec). The oracle is the PLAIN unsalted join
    * — proving the rewrite is semantics-preserving, the q44 pattern.
    */
  def saltedJoin(spark: SparkSession, dir: String, nSalts: Int = 8): DataFrame = {
    import spark.implicits._
    val big = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
      .withColumn("salt", pmod(xxhash64(col("l_orderkey"), col("l_quantity")), lit(nSalts)))
    val small = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
      .crossJoin(broadcast((0 until nSalts).toDF("salt")))
    big.join(small,
        big("l_orderkey") === small("o_orderkey") && big("salt") === small("salt"))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q3 shape — shipping priority: the classic 3-way fact join with
    * selective filters on every input, per-order revenue, top-10. What the
    * plan must do at 100 TB: push all three filters to the scans, join the
    * two facts on orderkey, let Catalyst/AQE pick broadcast for the
    * filtered customer side, two-phase the aggregate, and take the top 10
    * via TakeOrderedAndProject — never a global sort. Revenue is exact
    * integer 1e-4 dollars (price cents × integer discount points) summed
    * as BIGINT, divided once at the end.
    */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val cust = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_e4"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg((sum(col("rev_e4")) / 10000.0).as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        // o_orderdate parquet-reads as TIMESTAMP_NTZ; cast (identity on the
        // wall clock under the pinned-UTC session) before unix_millis
        unix_millis(col("o_orderdate").cast("timestamp")).as("orderdate_ms"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape — local-supplier volume: a 6-way join (two facts, four
    * dims) with a region filter and the local-supplier condition
    * (customer and supplier in the same nation) expressed as a second
    * equi-key on the join. The optimizer surface this exercises: join
    * REORDERING (region→nation prunes before the facts join), broadcast of
    * every dim side, and filter transitivity. Revenue exact as in Q3.
    */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val asia = t(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nations = t(spark, dir, "nation")
      .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_e4"))
    li
      .join(t(spark, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(t(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey")) // local supplier
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg((sum(col("rev_e4")) / 10000.0).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** MERGE / SCD-1 upsert as a full-outer join — the operation plain-
    * parquet Spark users hand-roll (no MERGE INTO without a table format):
    * matched rows take the update (here: account balance bumped by the
    * finished-order count), unmatched target rows pass through, unmatched
    * update rows insert with defaults. One shuffle on the merge key; at
    * scale the updates side is typically small → broadcast, and the
    * rewritten partition set is bounded by partitionBy (CorpusSink).
    * Balances stay on the cent grid (integer increments) so round(.,2) is
    * engine-stable.
    */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val target = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val updates = t(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      // one synthetic brand-new key exercises the insert branch
      .unionAll(spark.range(1).select(lit(-1L).as("o_custkey"), lit(5L).as("n_orders")))
    target.as("t")
      .join(updates.as("u"), col("t.c_custkey") === col("u.o_custkey"), "full_outer")
      .select(
        coalesce(col("t.c_custkey"), col("u.o_custkey")).as("c_custkey"),
        coalesce(col("t.c_mktsegment"), lit("NEW")).as("c_mktsegment"),
        round(coalesce(col("t.c_acctbal"), lit(0.0)) +
          coalesce(col("u.n_orders").cast("double"), lit(0.0)), 2).as("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** Snapshot diff (change-data-capture report): classify every key across
    * two versions of the documents table as insert / update / delete.
    *
    * The old snapshot is derived deterministically from the driver data so
    * both engines construct the identical "yesterday": keys ≡0 (mod 5) are
    * absent from old (today's inserts), keys ≡0 (mod 7) carry a different
    * old text (today's updates), and a band of synthetic retired keys
    * exists only in old (today's deletes).
    *
    * Shape at scale — the standard 100 TB snapshot-reconciliation plan:
    * each side collapses to (key, md5(payload)) IN ITS SCAN (the wide text
    * never crosses the exchange; the diff of two 50 TB snapshots shuffles
    * only keys + 32-hex digests), then ONE full-outer equi-join on the key
    * classifies everything; unchanged rows (the overwhelming majority) are
    * filtered out before the ordered report. Partition-aligned snapshots
    * (bucketed by key) would elide even that exchange.
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.docs(spark, dir)
    val newSide = docs.select(col("doc_id"), md5(col("text")).as("new_md5"))
    val oldSide = docs
      .filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 7 === 0, concat(lit("v0:"), col("text")))
          .otherwise(col("text"))).as("old_md5"))
      // retired keys live in NEGATIVE id space (-id-1): real doc_ids are
      // >= 0, so the synthetic band can never collide with a live key at
      // ANY scale — the previous +1e6 offset collided once doc_id passed
      // a million (ScaleData replication reaches it at modest factors),
      // fanning the full-outer join into duplicate-key spurious updates
      .unionAll(docs.filter(col("doc_id") % 11 === 0)
        .select((-col("doc_id") - 1L).as("doc_id"),
          md5(concat(lit("retired:"), col("doc_id"))).as("old_md5")))
    oldSide.join(newSide, Seq("doc_id"), "full_outer")
      .withColumn("change",
        when(col("old_md5").isNull, lit("insert"))
          .when(col("new_md5").isNull, lit("delete"))
          .when(col("old_md5") =!= col("new_md5"), lit("update")))
      .filter(col("change").isNotNull)
      .select(col("doc_id"), col("change"))
      .orderBy(col("doc_id"))
  }

  val queries = Map(
    "q143_snapshot_diff" -> snapshotDiff _,
    "q17_shipping_priority" -> shippingPriority _,
    "q54_local_volume" -> localSupplierVolume _,
    "q96_merge_upsert" -> mergeUpsert _,
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
    "q29_except" -> exceptKeys _,
    "q130_bag_set_ops" -> bagSetOps _,
    "q133_salted_join" -> ((s: SparkSession, d: String) => saltedJoin(s, d)))

  val oracle = Map(
    "q143_snapshot_diff" ->
      """SELECT doc_id, change FROM (
        |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |    CASE WHEN o.old_md5 IS NULL THEN 'insert'
        |         WHEN n.new_md5 IS NULL THEN 'delete'
        |         WHEN o.old_md5 <> n.new_md5 THEN 'update' END AS change
        |  FROM (
        |    SELECT doc_id,
        |      md5(CASE WHEN doc_id % 7 = 0 THEN 'v0:' || text ELSE text END) AS old_md5
        |    FROM documents WHERE doc_id % 5 <> 0
        |    UNION ALL
        |    SELECT -doc_id - 1,
        |      md5('retired:' || doc_id)
        |    FROM documents WHERE doc_id % 11 = 0) o
        |  FULL OUTER JOIN (
        |    SELECT doc_id, md5(text) AS new_md5 FROM documents) n
        |  ON o.doc_id = n.doc_id) d
        |WHERE change IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    "q17_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        |    / 10000.0 AS revenue,
        |  epoch_ms(o_orderdate) AS orderdate_ms, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q54_local_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        |    / 10000.0 AS revenue,
        |  count(*) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q96_merge_upsert" ->
      """WITH u AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
        |  UNION ALL SELECT CAST(-1 AS BIGINT), CAST(5 AS BIGINT))
        |SELECT coalesce(t.c_custkey, u.o_custkey) AS c_custkey,
        |  coalesce(t.c_mktsegment, 'NEW') AS c_mktsegment,
        |  round(coalesce(t.c_acctbal, 0) + coalesce(u.n_orders, 0), 2) AS c_acctbal
        |FROM customer t FULL OUTER JOIN u ON t.c_custkey = u.o_custkey
        |ORDER BY c_custkey""".stripMargin,
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
        |ORDER BY o_custkey""".stripMargin,
    "q133_salted_join" ->
      // the oracle is the UNSALTED join — the rewrite must be invisible
      """SELECT o_orderpriority, round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q130_bag_set_ops" ->
      """WITH ea AS (
        |  SELECT o_custkey FROM orders
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |ia AS (
        |  SELECT o_custkey FROM orders
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |SELECT op, o_custkey, n FROM (
        |  SELECT 'except_all' AS op, o_custkey, count(*) AS n
        |  FROM ea GROUP BY o_custkey
        |  UNION ALL
        |  SELECT 'intersect_all', o_custkey, count(*)
        |  FROM ia GROUP BY o_custkey) u
        |ORDER BY op, o_custkey""".stripMargin)
}
