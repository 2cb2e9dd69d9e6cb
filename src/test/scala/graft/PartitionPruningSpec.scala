package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition pruning — at 100 TB the events table is date-partitioned and a
  * day filter must touch only that day's files, not the whole corpus.
  */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = SparkTestSession.sfDir

  test("date-partitioned write + day filter prunes to one partition") {
    val out = Files.createTempDirectory("events_parted").toString
    Tables.events(spark, dir)
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date").parquet(out)
    val nParts = new java.io.File(out).listFiles()
      .count(_.getName.startsWith("event_date="))
    assert(nParts > 1, s"testdata spans only $nParts dates — pruning unobservable")

    val q = spark.read.parquet(out)
      .filter(col("event_date") === "2024-01-01")
      .groupBy(col("event_type")).count()
    // ask the scan node itself which partitions survive its filters
    // (inputFiles reports the unpruned relation listing)
    val scan = q.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty, "day filter not recognized as partition filter")
    val selected = scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
    assert(selected.length == 1, s"read ${selected.length} of $nParts partitions")
    assert(q.collect().nonEmpty)
  }
}
