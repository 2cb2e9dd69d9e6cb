package graft

import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LocalRelation}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RelationalPack

/** Faithful re-test of the reference's manual optimizer observations
  * (homework-5/README.md plan-change logs) as plan-shape assertions.
  * Matches on node TYPES, not rule names — Spark 4 here vs 3.1.2 there
  * (SURVEY.md §7.3).
  */
class RelationalPlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def prep(): Unit = Tables.studentView(spark, SparkTestSession.sfDir)

  test("Q1: id <> null collapses the whole query to an empty LocalRelation") {
    prep()
    val qe = spark.sql(RelationalPack.q1Sql).queryExecution
    val opt = qe.optimizedPlan
    assert(opt.isInstanceOf[LocalRelation], s"expected LocalRelation, got:\n$opt")
    assert(opt.asInstanceOf[LocalRelation].data.isEmpty)
    assert(spark.sql(RelationalPack.q1Sql).collect().isEmpty)
  }

  test("Q2: EXCEPT rewrites to a null-safe LeftAnti join over Aggregates") {
    prep()
    val opt = spark.sql(RelationalPack.q2Sql).queryExecution.optimizedPlan
    val antiJoins = opt.collect { case j: Join if j.joinType == LeftAnti => j }
    assert(antiJoins.nonEmpty, s"no LeftAnti join in:\n$opt")
    // null-safe equality on both keys (README.md:400 `(id <=> id) AND (name <=> name)`)
    assert(antiJoins.head.condition.get.sql.contains("<=>"))
    // DISTINCT became an Aggregate (ReplaceDistinctWithAggregate)
    assert(opt.collect { case a: Aggregate => a }.nonEmpty)
  }

  test("Q2: (100 - 10) is constant-folded to 90") {
    prep()
    val opt = spark.sql(RelationalPack.q2Sql).queryExecution.optimizedPlan
    val s = opt.toString
    assert(s.contains("90"), s)
    assert(!s.contains("100 - 10") && !s.contains("(100 + -10)"), s)
  }

  test("nested filters merge into a single conjunctive Filter") {
    prep()
    val opt = spark.sql(
      """select name, age from (select id, name, age from student where age > 18) t
        |where age < 35""".stripMargin).queryExecution.optimizedPlan
    val filters = opt.collect { case f: Filter => f }
    assert(filters.size == 1, s"expected 1 merged Filter, got ${filters.size}:\n$opt")
    assert(filters.head.condition.sql.toLowerCase.contains("and"))
  }

  test("EliminateSorts: ORDER BY on a constant key removes the Sort (README.md:670-680)") {
    prep()
    import org.apache.spark.sql.catalyst.plans.logical.Sort
    val opt = spark.sql(
      "select id, (100 - 10) as score from student where age > 18 order by score")
      .queryExecution.optimizedPlan
    assert(opt.collect { case s: Sort => s }.isEmpty, s"Sort survived:\n$opt")
  }

  test("InferFiltersFromConstraints injects isnotnull on join keys (README.md:598-608)") {
    prep()
    val opt = spark.sql(
      """select s1.name from student s1 join student s2 on s1.id = s2.id
        |where s1.age > 18""".stripMargin).queryExecution.optimizedPlan
    // the inferred isnotnull(id) is pushed through the student projection,
    // rewriting the alias to its defining CASE expression
    assert(opt.toString.contains("ELSE isnotnull("), s"no inferred isnotnull:\n$opt")
  }

  test("subquery decorrelation: IN -> semi join, scalar subquery -> outer join + agg") {
    import org.apache.spark.sql.catalyst.plans.{LeftOuter, LeftSemi}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val in = operators.RelationalPack.inSubquery(spark, SparkTestSession.sfDir)
      .queryExecution.optimizedPlan
    assert(in.collect { case j: Join if j.joinType == LeftSemi => j }.nonEmpty, in.toString)
    val sc = operators.RelationalPack.scalarSubquery(spark, SparkTestSession.sfDir)
      .queryExecution.optimizedPlan
    assert(sc.collect { case j: Join if j.joinType == LeftOuter => j }.nonEmpty, sc.toString)
    assert(sc.collect { case a: Aggregate => a }.nonEmpty)
  }

  test("NOT IN over a null-bearing subquery yields the empty result (3VL)") {
    val rows = operators.RelationalPack.notInWithNulls(spark, SparkTestSession.sfDir)
    assert(rows.collect().isEmpty)
  }

  test("column pruning reaches the parquet scan") {
    prep()
    val exec = spark.sql("select name from student where age > 18")
      .queryExecution.executedPlan.toString
    assert(exec.contains("c_name"), exec)
    assert(!exec.contains("c_acctbal"), s"unpruned scan:\n$exec")
  }
}
