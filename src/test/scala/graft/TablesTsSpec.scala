package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Tables.normalizeTs must canonicalize every `ts` physical format the
  * events table has shipped in (raw epoch-ns BIGINT from the
  * TIMESTAMP(NANOS) era and ScaleData rehearsal parquet; TIMESTAMP_NTZ from
  * the timestamp[us] era; already-normalized TIMESTAMP) to the same
  * µs-precision TimestampType instants — the round-7 regression was exactly
  * a loader hard-wired to one era's format.
  */
class TablesTsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 2024-01-01T00:00:00.123456Z expressed in each era's physical encoding
  private val micros = 1704067200123456L

  test("epoch-ns long, NTZ wall-clock, and TimestampType all normalize to the same instant") {
    val fromLong = Tables.normalizeTs(
      Seq(micros * 1000L).toDF("ts"))
    val fromTz = Tables.normalizeTs(
      Seq(micros * 1000L).toDF("raw")
        .select(timestamp_micros(expr("raw div 1000")).as("ts")))
    val fromNtz = Tables.normalizeTs(
      Seq(micros * 1000L).toDF("raw")
        .select(timestamp_micros(expr("raw div 1000")).cast(TimestampNTZType).as("ts")))
    for (df <- Seq(fromLong, fromTz, fromNtz)) {
      assert(df.schema("ts").dataType == TimestampType)
      assert(df.select(unix_micros(col("ts"))).as[Long].head() == micros)
    }
  }

  test("driver testdata events loads as TimestampType with sane epoch range") {
    val ev = Tables.events(spark, SparkTestSession.sfDir)
    assert(ev.schema("ts").dataType == TimestampType)
    val Array(lo, hi) = ev.agg(min(unix_millis(col("ts"))), max(unix_millis(col("ts"))))
      .as[(Long, Long)].head() match { case (a, b) => Array(a, b) }
    // ts spans from 2024-01-01 (FIXTURES.md); a mis-decoded scale (ns read
    // as µs, µs read as ms) lands decades away from [2024, 2030)
    assert(lo >= 1704067200000L && hi < 1893456000000L, s"epoch-ms range [$lo, $hi]")
  }

  test("streaming readEvents probes the staged file format and matches the batch loader") {
    val watch = java.nio.file.Files.createTempDirectory("events_probe")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"),
      watch.resolve("part-0.parquet"))
    val stream = graft.streaming.EventStreamJobs.readEvents(spark, watch.toString)
    assert(stream.schema("ts").dataType == TimestampType)
    val q = stream.select(col("event_id"), col("ts"))
      .writeStream.outputMode("append").format("memory").queryName("ts_probe_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ts_probe_out").orderBy(col("event_id"))
        .as[(Long, Timestamp)].collect().toSeq
      val want = Tables.events(spark, SparkTestSession.sfDir)
        .select(col("event_id"), col("ts")).orderBy(col("event_id"))
        .as[(Long, Timestamp)].collect().toSeq
      assert(got == want)
    } finally q.stop()
  }
}
