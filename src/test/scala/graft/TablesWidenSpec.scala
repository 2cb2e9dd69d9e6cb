package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the [[Tables.widened]] parallelism floor: it must widen a
  * narrow (single-row-group) layout, be the IDENTITY whenever the layout
  * already carries enough scan parallelism or the hash key is missing, and
  * never change row contents. The at-scale promise — no exchange on a
  * table with ≥cap files — is exactly the identity arm tested here.
  */
class TablesWidenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def writeTable(dir: String, name: String, nFiles: Int, rows: Int): Unit = {
    import spark.implicits._
    (0 until rows).map(i => (i.toLong, s"v$i")).toDF("doc_id", "text")
      .repartition(nFiles)
      .write.mode("overwrite").parquet(s"$dir/$name.parquet")
  }

  test("single-file table widens to a multi-partition frame with identical rows") {
    val dir = Files.createTempDirectory("widen1").toString
    writeTable(dir, "documents", nFiles = 1, rows = 2000)
    val plain = Tables.t(spark, dir, "documents")
    val wide = Tables.widened(spark, dir, "documents", "doc_id")
    assert(wide.rdd.getNumPartitions > plain.rdd.getNumPartitions,
      "a 1-file layout must gain partitions")
    // content-identical (order-insensitive)
    assert(wide.exceptAll(plain).isEmpty && plain.exceptAll(wide).isEmpty)
  }

  test("missing hash key is the identity (degenerate spec fixtures)") {
    val dir = Files.createTempDirectory("widen2").toString
    writeTable(dir, "documents", nFiles = 1, rows = 100)
    val wide = Tables.widened(spark, dir, "documents", "no_such_column")
    assert(wide.queryExecution.logical ==
      Tables.t(spark, dir, "documents").queryExecution.logical,
      "absent key must fall back to the plain relation, not fail analysis")
  }

  test("a layout at/above the fan-out cap is served unchanged (the at-scale arm)") {
    val dir = Files.createTempDirectory("widen3").toString
    // WidenParts files: leafParallelismAtMost short-circuits on the file
    // count alone — no footer reads, no repartition node
    writeTable(dir, "documents", nFiles = Tables.WidenParts, rows = 2000)
    val wide = Tables.widened(spark, dir, "documents", "doc_id")
    assert(wide.queryExecution.logical ==
      Tables.t(spark, dir, "documents").queryExecution.logical,
      "a wide layout must not pay an exchange")
  }

  test("leafParallelismAtMost counts row groups for small listings and caps at cap") {
    val dir = Files.createTempDirectory("widen4").toString
    writeTable(dir, "documents", nFiles = 3, rows = 300)
    val n = Tables.leafParallelismAtMost(spark, s"$dir/documents.parquet", 32)
    assert(n == 3, s"3 single-row-group files must report 3, got $n")
    assert(Tables.leafParallelismAtMost(spark, s"$dir/documents.parquet", 2) == 2,
      "short-circuits at cap without reading extra footers")
  }
}
