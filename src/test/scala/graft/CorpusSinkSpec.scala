package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CorpusSink

/** Partitioned-output contract: directory layout, file-size bounding,
  * round-trip equality, and partition pruning on read.
  */
class CorpusSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = SparkTestSession.sfDir

  test("partitioned write: layout, bounded files, exact round-trip, pruning") {
    val out = Files.createTempDirectory("corpus_sink").resolve("docs").toString
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
    // AQE pinned off for the write: on 500 rows it (correctly) coalesces
    // the salted shuffle to one partition, hiding the multi-task layout
    // this spec observes; at real partition sizes AQE leaves the salt's
    // task spread intact.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try CorpusSink.writePartitioned(docs, out, Seq("source"), maxRecordsPerFile = 10)
    finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)

    // one directory per source value
    val sources = docs.select(col("source")).distinct().collect().map(_.getString(0))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.toSet == sources.map(s => s"source=$s").toSet)

    // maxRecordsPerFile=10 means every data file holds <= 10 rows
    val files = dirs.flatMap(d => new java.io.File(s"$out/$d").listFiles())
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    // the content salt spreads each directory over multiple write tasks
    // (bare repartition(partitionCols) would serialize each onto ONE task
    // → one part file per task before maxRecordsPerFile rolling; with 500
    // docs over few sources, a salted dir must show >1 task's files)
    val tasksInBiggestDir = dirs.map(d =>
      new java.io.File(s"$out/$d").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(_.getName.replaceAll("part-(\\d+)-.*", "$1")).distinct.length).max
    assert(tasksInBiggestDir > 1,
      s"skewed partition written by a single task (salt not applied)")
    files.foreach { f =>
      val n = spark.read.parquet(f.getPath).count()
      assert(n <= 10, s"${f.getName} has $n rows")
    }

    // byte-faithful round trip (partition column recovered from dir names)
    val back = CorpusSink.read(spark, out)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)

    // partition pruning: a source filter must reach the scan as a
    // partition filter, not a data filter
    val plan = CorpusSink.read(spark, out)
      .filter(col("source") === sources.head)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("source"),
      s"source filter did not prune partitions:\n$plan")
  }

  test("schema evolution: mergeSchema unions columns across file generations") {
    import spark.implicits._
    val out = Files.createTempDirectory("corpus_evolve").toString
    // generation 1: (doc_id, text); generation 2 adds a quality column
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(s"$out/g=1")
    Seq((3L, "gamma", 0.9), (4L, "delta", 0.4)).toDF("doc_id", "text", "quality")
      .write.parquet(s"$out/g=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert(merged.columns.toSet == Set("doc_id", "text", "quality", "g"))
    val rows = merged.select(col("doc_id"), col("quality")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows(1L).isEmpty && rows(3L).contains(0.9))
  }

  test("range-sorted write: files are internally sorted with disjoint key ranges; no global sort") {
    val out = Files.createTempDirectory("corpus_sorted").resolve("docs").toString
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    // AQE off so the sampled range exchange keeps all requested output
    // partitions on this tiny input (same reasoning as the layout test)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try CorpusSink.writeRangeSorted(docs, out, Seq("doc_id"), numFiles = 4)
    finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)

    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(files.length > 1, s"expected multiple files, got ${files.length}")
    // per-file: internally sorted; collect each file's [min, max]
    val ranges = files.map { f =>
      val ids = spark.read.parquet(f).select(col("doc_id")).collect().map(_.getLong(0))
      assert(ids.sameElements(ids.sorted), s"$f not internally sorted")
      (ids.min, ids.max)
    }
    // ranges must be pairwise disjoint — the property that makes parquet
    // min/max stats skip whole files for point/range predicates
    ranges.sortBy(_._1).sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"overlapping ranges: $ranges")
      case _ =>
    }
    // lossless: union of files == input
    val back = spark.read.parquet(out).select(col("doc_id")).collect()
      .map(_.getLong(0)).sorted
    val want = docs.select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(back.sameElements(want))
    // the plan pays a range exchange + LOCAL sorts, never a global sort
    val plan = docs.repartitionByRange(4, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.matches("(?s).*Sort \\[[^\\]]*\\], true.*"),
      s"unexpected global sort:\n$plan")
  }
}
