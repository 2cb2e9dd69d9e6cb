package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfPack

class AsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = SparkTestSession.sfDir

  test("as-of semantics: match is the max error ts at-or-before each purchase") {
    val rows = AsOfPack.asOfJoin(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("err_ms") <= r.getAs[Long]("p_ms"),
        s"matched error after purchase: $r")
    }
    // cross-check one user against a driver-side recompute
    val u = rows.head.getAs[Long]("user_id")
    val errs = Tables.events(spark, dir)
      .filter(s"event_type = 'error' AND user_id = $u")
      .select(org.apache.spark.sql.functions.unix_millis(
        org.apache.spark.sql.functions.col("ts")))
      .collect().map(_.getLong(0)).sorted
    rows.filter(_.getAs[Long]("user_id") == u).foreach { r =>
      val expected = errs.takeWhile(_ <= r.getAs[Long]("p_ms")).lastOption
      assert(expected.contains(r.getAs[Long]("err_ms")), s"wrong as-of match: $r")
    }
  }

  test("equal-timestamp right rows match (>= boundary, untested by data)") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 50L, "p0")).toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 9.9), (1L, 10L, 1.1)).toDF("k", "rt", "v")
    val got = AsOfPack.asOf(left, right, "k", "t", "rt", Seq("rt", "v"))
      .collect().map(r => (r.getAs[String]("tag"), r.getAs[Long]("rt"), r.getAs[Double]("v")))
      .toSet
    // p1 at t=100 must match the rt=100 row (>=), p0 at t=50 matches rt=10
    assert(got == Set(("p1", 100L, 9.9), ("p0", 10L, 1.1)))
  }

  test("as-of join plan: one shuffle on the join key, no per-row probe join") {
    val plan = AsOfPack.asOfJoin(spark, dir).queryExecution.executedPlan.toString
    // union-window formulation: a Window over user_id, no Cartesian/NLJ
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"as-of join degenerated to a product join:\n$plan")
  }
}
