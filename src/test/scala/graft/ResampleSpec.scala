package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventsPack

/** q140 resample/gap-fill semantics: dense per-key hourly spine, zero
  * counts on silent hours, carry-forward of the last observed hourly sum.
  */
class ResampleSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  lazy val spark = SparkTestSession.spark
  val dir = SparkTestSession.sfDir

  lazy val out = EventsPack.resampleGapfill(spark, dir).cache()

  // release the cached frame when the suite ends — the session is shared
  // with every later suite, including the deliberately memory-starved
  // spill tests, and pinned storage blocks would compete with them
  override def afterAll(): Unit = { out.unpersist(); super.afterAll() }

  test("spine is dense: one row per hour from each key's first to last hour") {
    val perKey = out.groupBy(col("event_type"))
      .agg(count(lit(1)).as("rows"),
        ((max(col("bucket_ms")) - min(col("bucket_ms"))) / 3600000L + 1).as("hours"))
      .filter(col("rows") =!= col("hours"))
    assert(perKey.count() == 0)
  }

  test("gap rows carry the previous observed sum and n=0; observed rows match the plain hourly agg") {
    val gaps = out.filter(col("gap_filled"))
    assert(gaps.count() > 0, "testdata has minute-scale gaps; a dense grid must contain filled hours")
    assert(gaps.filter(col("n") =!= 0).count() == 0)
    // every gap row's sum equals the latest earlier non-gap row's sum
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("bucket_ms"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val mismatch = out
      .withColumn("prev_obs", last(when(!col("gap_filled"), col("sum_value")),
        ignoreNulls = true).over(w))
      .filter(col("gap_filled") && !(col("sum_value") <=> col("prev_obs")))
    assert(mismatch.count() == 0)
    // non-gap rows agree with a directly-computed hourly aggregate
    val hourly = graft.Tables.events(spark, dir)
      .groupBy(col("event_type"),
        graft.Tables.tsMillis(date_trunc("hour", col("ts"))).as("bucket_ms"))
      .agg(count(lit(1)).as("n2"),
        sum(col("value").cast("decimal(18,6)")).cast("decimal(28,6)").as("v2"))
    val bad = out.filter(!col("gap_filled"))
      .join(hourly, Seq("event_type", "bucket_ms"), "left")
      .filter(col("n") =!= col("n2") || !(col("sum_value") <=> col("v2")))
    assert(bad.count() == 0)
  }

  test("plan: single scan of events feeds the hourly agg; spine explode is distributed") {
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("Generate explode"), s"expected a distributed sequence-explode spine:\n$plan")
  }
}
