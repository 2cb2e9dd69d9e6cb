package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE runtime behaviors the 100 TB story leans on: skew-join splitting
  * (the automatic counterpart of q44's manual salting) — a hot key's
  * oversized shuffle partition is split into multiple tasks at runtime,
  * without touching the query.
  */
class AdaptiveSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force a shuffle join
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~98% of fact rows share key 7; dim is uniform
      val fact = spark.range(0, 50000).select(
        when(col("id") % 50 =!= 0, lit(7L)).otherwise(col("id") % 1000).as("k"),
        col("id").as("v"))
      val dim = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = fact.join(dim, "k")
      // run through the SAME QueryExecution so the adaptive plan finalizes
      assert(joined.collect().length == 50000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"adaptive plan did not finalize:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join for splitting:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
