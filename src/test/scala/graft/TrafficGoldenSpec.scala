package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrafficPack

/** FIXTURES.md B1 golden test: hw1 semantics on a handcrafted 3-line TSV
  * with hand-computed expected sums (MyMapper.java:23-29 + MyReduce.java:21-31).
  */
class TrafficGoldenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("hw1 TSV rollup matches hand-computed sums") {
    val dir = Files.createTempDirectory("traffic").toFile
    val f = new java.io.File(dir, "traffic.tsv")
    Files.writeString(f.toPath,
      "x\t13800000001\tx\tx\tx\tx\tx\t10\t20\tx\n" +
      "x\t13800000001\tx\tx\tx\tx\tx\t5\t7\tx\n" +
      "x\t13900000002\tx\tx\tx\tx\tx\t1\t2\tx\n")
    val got = TrafficPack.tsvTraffic(spark, f.getPath).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("13800000001", 15L, 27L, 42L),
      ("13900000002", 1L, 2L, 3L)))
  }

  test("lineitem rollup: sum_total == sum_up + sum_down per key") {
    val df = TrafficPack.trafficRollup(spark, SparkTestSession.sfDir)
    val bad = df.where(
      org.apache.spark.sql.functions.abs(
        org.apache.spark.sql.functions.col("sum_total") -
          (org.apache.spark.sql.functions.col("sum_up") +
            org.apache.spark.sql.functions.col("sum_down"))) > 0.02)
    assert(bad.count() == 0)
  }
}
