package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** hw5 pack — the Spark-SQL surface the reference studies, run literally.
  *
  * The reference (homework-5/README.md:114,340) traces two CLI queries over a
  * Hive `student(id string, name string, age int, sex string)` table through
  * the Catalyst analyzer/optimizer. Here the same literal SQL runs over a
  * `student` temp view derived from `customer` (Tables.student, with NULL
  * id/name rows injected so the three-valued-logic and null-safe EXCEPT
  * behaviors the reference documents are observable in the results, not just
  * the plans). Plan-shape assertions live in RelationalPlanSpec.
  */
object RelationalPack extends QueryPack {

  /** Reference Q1 (homework-5/README.md:114): `id <> null` is never true, so
    * Catalyst collapses the whole query to an empty LocalRelation
    * (README.md:266-287 — NullPropagation → ReplaceNullWithFalseInPredicate →
    * PruneFilters). Result: zero rows, schema (name).
    */
  val q1Sql: String =
    "select name from (select id, name, age from student where age > 18 and id <> null) t where age < 35"

  def hw5Q1(spark: SparkSession, dir: String): DataFrame = {
    Tables.studentView(spark, dir)
    spark.sql(q1Sql)
  }

  /** Reference Q2 (homework-5/README.md:340): EXCEPT → null-safe LeftAnti
    * join (ReplaceExceptWithAntiJoin, README.md:395-407), DISTINCT →
    * Aggregate (README.md:410-422), `(100-10)` constant-folded, `id > 100`
    * via implicit cast(id as int). The literal query orders by the constant
    * `score` (eliminated by EliminateSorts); the dumped variant appends a
    * deterministic key so the oracle compare is row-order-stable.
    */
  val q2Sql: String =
    """select id, name, (100 - 10) as score from
      |  (select id, name from student where age > 18
      |   except
      |   select DISTINCT id, name from student where sex = 'm') t
      |where id > 100 order by score""".stripMargin

  def hw5Q2(spark: SparkSession, dir: String): DataFrame = {
    Tables.studentView(spark, dir)
    spark.sql(q2Sql + ", cast(id as int)")
  }

  /** Q1 shape without the degenerate null predicate: nested filters merge
    * (CombineFilters/PushDownPredicates, README.md:244-249) and only the
    * referenced customer columns are scanned (ColumnPruning).
    */
  def filterMerge(spark: SparkSession, dir: String): DataFrame = {
    Tables.studentView(spark, dir)
    spark.sql(
      """select name, age from (select id, name, age from student where age > 18) t
        |where age < 35 and name is not null order by name, age""".stripMargin)
  }

  /** Implicit string→int cast comparison (README.md:359 `cast(id as int)`). */
  def castCompare(spark: SparkSession, dir: String): DataFrame = {
    Tables.studentView(spark, dir)
    spark.sql(
      """select id, name, age from student
        |where id > 100 and age < 20 order by cast(id as int)""".stripMargin)
  }

  /** Literal IN-subquery — Catalyst decorrelates to a left-semi join. */
  def inSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.t(spark, dir, "customer").createOrReplaceTempView("customer_rel")
    Tables.t(spark, dir, "orders").createOrReplaceTempView("orders_rel")
    spark.sql(
      """select c_custkey, c_mktsegment from customer_rel
        |where c_custkey in (select o_custkey from orders_rel
        |                    where o_orderstatus = 'F')
        |order by c_custkey""".stripMargin)
  }

  /** NOT IN against a subquery containing NULLs: three-valued logic makes
    * the whole predicate never-true, so the result is EMPTY — the classic
    * SQL trap, asserted equal across engines (mirrors the reference's
    * `id <> null` study at the subquery level).
    */
  def notInWithNulls(spark: SparkSession, dir: String): DataFrame = {
    Tables.studentView(spark, dir)
    spark.sql(
      """select id, name from student
        |where id not in (select id from student where sex = 'm')
        |order by cast(id as int)""".stripMargin)
  }

  /** Correlated scalar subquery — decorrelated to an aggregate + left
    * outer join (the §4 "subquery decorrelation" batch, exercised).
    */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.t(spark, dir, "customer").createOrReplaceTempView("customer_rel")
    Tables.t(spark, dir, "orders").createOrReplaceTempView("orders_rel")
    spark.sql(
      """select c_custkey,
        |  (select round(max(o_totalprice), 2) from orders_rel
        |   where o_custkey = c_custkey) as max_order
        |from customer_rel order by c_custkey""".stripMargin)
  }

  /** Correlated LATERAL subquery with ORDER BY + LIMIT — the lateral
    * top-n idiom (each outer row joined to its own ranked slice of the
    * inner table). Catalyst decorrelates it through the
    * DecorrelateInnerQuery/RewriteLateralSubquery batch into a ranked
    * join — no per-row re-execution, unlike a naive nested-loop reading
    * of the syntax. Customers with no orders drop out (inner join
    * semantics of the comma lateral).
    */
  def lateralTopN(spark: SparkSession, dir: String): DataFrame = {
    Tables.t(spark, dir, "customer").createOrReplaceTempView("customer_rel")
    Tables.t(spark, dir, "orders").createOrReplaceTempView("orders_rel")
    spark.sql(
      """select c_custkey, t.o_orderkey, t.o_totalprice
        |from customer_rel, lateral (
        |  select o_orderkey, o_totalprice from orders_rel
        |  where o_custkey = c_custkey
        |  order by o_totalprice desc, o_orderkey limit 2) t
        |order by c_custkey, t.o_totalprice desc, t.o_orderkey""".stripMargin)
  }

  val queries = Map(
    "q131_lateral_topn" -> lateralTopN _,
    "q14_in_subquery" -> inSubquery _,
    "q15_not_in_nulls" -> notInWithNulls _,
    "q16_scalar_subquery" -> scalarSubquery _,
    "q10_hw5_q1" -> hw5Q1 _,
    "q11_hw5_q2" -> hw5Q2 _,
    "q12_filter_merge" -> filterMerge _,
    "q13_cast_compare" -> castCompare _)

  private def withStudent(body: String): String =
    s"WITH student AS (\n${Tables.studentSql}\n)\n$body"

  val oracle = Map(
    "q14_in_subquery" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q15_not_in_nulls" -> withStudent(
      """SELECT id, name FROM student
        |WHERE id NOT IN (SELECT id FROM student WHERE sex = 'm')
        |ORDER BY CAST(id AS INT)""".stripMargin),
    "q16_scalar_subquery" ->
      """SELECT c_custkey,
        |  (SELECT round(max(o_totalprice), 2) FROM orders
        |   WHERE o_custkey = c_custkey) AS max_order
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q131_lateral_topn" ->
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin,
    "q10_hw5_q1" -> withStudent(
      "SELECT name FROM (SELECT id, name, age FROM student WHERE age > 18 AND id <> NULL) t WHERE age < 35"),
    "q11_hw5_q2" -> withStudent(
      """SELECT id, name, (100 - 10) AS score FROM
        |  (SELECT id, name FROM student WHERE age > 18
        |   EXCEPT
        |   SELECT DISTINCT id, name FROM student WHERE sex = 'm') t
        |WHERE CAST(id AS INT) > 100 ORDER BY score, CAST(id AS INT)""".stripMargin),
    "q12_filter_merge" -> withStudent(
      """SELECT name, age FROM (SELECT id, name, age FROM student WHERE age > 18) t
        |WHERE age < 35 AND name IS NOT NULL ORDER BY name NULLS FIRST, age NULLS FIRST""".stripMargin),
    "q13_cast_compare" -> withStudent(
      """SELECT id, name, age FROM student
        |WHERE CAST(id AS INT) > 100 AND age < 20 ORDER BY CAST(id AS INT)""".stripMargin))
}
