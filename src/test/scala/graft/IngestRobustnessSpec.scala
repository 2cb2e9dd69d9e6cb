package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Ingest-robustness behaviors a 100 TB pipeline depends on: malformed
  * rows must be quarantined, not kill the job or silently vanish; and
  * per-stratum sampling must honor requested fractions deterministically
  * under a fixed seed.
  */
class IngestRobustnessSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = SparkTestSession.sfDir

  test("PERMISSIVE csv ingest quarantines malformed rows into _corrupt_record") {
    val p = Files.createTempDirectory("ingest").resolve("data.tsv")
    Files.writeString(p,
      "13800000001\t15\t27\n" +
        "garbage-line-without-tabs\n" +      // wrong arity
        "13900000002\tNaNish\t2\n" +         // unparseable int
        "13700000003\t5\t6\n")
    val schema = StructType(Seq(
      StructField("phone", StringType),
      StructField("up", IntegerType),
      StructField("down", IntegerType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read
      .option("sep", "\t").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema).csv(p.toString)
      .cache() // corrupt-record column requires the full row in one pass
    val good = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(good.count() == 2 && bad.count() == 2)
    assert(good.select(sum(col("up"))).head.getLong(0) == 20L)
    // the quarantined rows carry their raw text for later repair
    val raw = bad.select(col("_corrupt_record")).collect().map(_.getString(0))
    assert(raw.exists(_.contains("garbage-line-without-tabs")))
    assert(raw.exists(_.contains("NaNish")))
    df.unpersist()
  }

  test("FAILFAST mode rejects the malformed file loudly") {
    val p = Files.createTempDirectory("ingest2").resolve("data.tsv")
    Files.writeString(p, "a\t1\nb\tnot-an-int\n")
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", IntegerType)))
    val e = intercept[Exception] {
      spark.read.option("sep", "\t").option("mode", "FAILFAST")
        .schema(schema).csv(p.toString).collect()
    }
    assert(e.getMessage != null)
  }

  test("stratified sampleBy honors per-stratum fractions under a fixed seed") {
    val docs = Tables.t(spark, dir, "documents").select(col("doc_id"), col("source"))
    val sources = docs.select(col("source")).distinct().collect()
      .map(_.getString(0)).sorted
    val fractions = sources.zipWithIndex
      .map { case (s, i) => s -> (if (i % 2 == 0) 0.8 else 0.1) }.toMap
    val sampled = docs.stat.sampleBy("source", fractions, seed = 42L)
    // deterministic under the seed
    val again = docs.stat.sampleBy("source", fractions, seed = 42L)
    assert(sampled.collect().toSeq == again.collect().toSeq)
    // per-stratum rates land near the requested fractions (Bernoulli
    // sampling over ~25 rows per stratum at sf0.01 — wide tolerance)
    val totals = docs.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = sampled.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    fractions.foreach { case (s, f) =>
      val rate = got.getOrElse(s, 0L).toDouble / totals(s)
      assert(math.abs(rate - f) < 0.35, s"stratum $s: requested $f, got $rate")
    }
  }
}
