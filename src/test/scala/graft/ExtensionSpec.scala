package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{GraftExtensions, PlanLoggingRule, PlanObservations}

/** hw5 Q3 parity: the injected optimizer rule observes plans
  * (MySparkSessionExtension.scala:13-25 behavior).
  *
  * Note: tests reuse the shared local SparkContext, and
  * SparkSession.getOrCreate would return the existing extension-less
  * session — so the firing test injects through experimental
  * extraOptimizations (same optimizer hook point), and the
  * SparkSessionExtensions wiring is exercised directly.
  */
class ExtensionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("the logging rule observes optimizer plans without changing results") {
    PlanObservations.clear()
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ PlanLoggingRule()
    try {
      import spark.implicits._
      val result = Seq((1, "a"), (2, "b"), (3, "a")).toDF("id", "tag")
        .filter($"id" > 1).groupBy($"tag").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(result == Map("a" -> 1L, "b" -> 1L))
      val seen = PlanObservations.snapshot()
      assert(seen.nonEmpty, "rule never fired")
      assert(seen.exists(_.contains("Aggregate")), "no Aggregate observed")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("GraftExtensions wires the rule through injectOptimizerRule") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val rules = org.apache.spark.sql.GraftExtensionProbe.optimizerRules(ext, spark)
    assert(rules.exists(_.isInstanceOf[PlanLoggingRule]), rules.toString)
  }

  test("observation buffer is bounded") {
    PlanObservations.clear()
    (1 to 200).foreach(i => PlanObservations.record(s"plan-$i"))
    val snap = PlanObservations.snapshot()
    assert(snap.size <= 64 && snap.last == "plan-200")
  }
}
