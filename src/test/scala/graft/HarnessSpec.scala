package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.types._

/** Unit pins for the round-9 harness defenses themselves — the bench
  * contention-retry history parser and Verify's wide-decimal gate. Both
  * guard the driver gates silently (a regression would just disable the
  * defense, never fail a query), so they get direct coverage here.
  */
class HarnessSpec extends AnyFunSuite {

  test("Bench.parseHistory reads its own file format and ignores non-query fields") {
    val line =
      """{"sf":"/root/testdata/sf0.1","q01_traffic_rollup":1.064715684,""" +
        """"q148_streamed_attribution":4.6e0,"q99_click_attribution":0.52}"""
    val h = Bench.parseHistory(line)
    assert(h == Map(
      "q01_traffic_rollup" -> 1.064715684,
      "q148_streamed_attribution" -> 4.6,
      "q99_click_attribution" -> 0.52))
  }

  test("Bench.parseHistory survives a full BENCH_LOCAL line (arrays, loadavg, compact keys)") {
    val line =
      """{"metric":"total","value":99.971,"unit":"sec","queries":{"q02_traffic_total":0.36},""" +
        """"sf":"/root/testdata/sf0.1","runs":3,"failed":["q999_zzz_broken"],""" +
        """"retried":["q01_traffic_rollup"],"loadavg_start":"2.56 3.08 2.53"}"""
    val h = Bench.parseHistory(line)
    // numeric pairs only: the failed/retried ARRAY members carry no value
    // and must not parse; "value"/"runs" lack the qNN_ prefix
    assert(h == Map("q02_traffic_total" -> 0.36))
  }

  test("Bench.parseHistory of garbage or empty input is empty, not an exception") {
    assert(Bench.parseHistory("").isEmpty)
    assert(Bench.parseHistory("not json at all").isEmpty)
    // a compact short-key line ("q01":1.1) has no _name suffix — ignored,
    // so the driver's 2000-char stdout tail can never poison the history
    assert(Bench.parseHistory("""{"q01":1.065,"q02":0.320}""").isEmpty)
  }

  test("scratchDir default is salted with the application id (concurrent-session isolation)") {
    // streaming jobs fs.delete their scratch at start — a fixed shared
    // default would let two concurrent sessions (bench + test run) delete
    // each other's watch dirs and checkpoints mid-query; an explicit conf
    // override is taken verbatim (the caller owns isolation then)
    val spark = SparkTestSession.spark
    assert(Tables.scratchDir(spark)
      == s"/tmp/graft_scratch/${spark.sparkContext.applicationId}")
    spark.conf.set("spark.graft.scratchDir", "/tmp/explicit_scratch")
    try assert(Tables.scratchDir(spark) == "/tmp/explicit_scratch")
    finally spark.conf.unset("spark.graft.scratchDir")
  }

  test("Verify.wideDecimals flags precision > 18 at any nesting depth, and only those") {
    assert(Verify.wideDecimals(new StructType()
      .add("a", DecimalType(18, 6)).add("b", LongType)).isEmpty)
    assert(Verify.wideDecimals(new StructType()
      .add("a", DecimalType(19, 6))) == Seq("a: DecimalType(19,6)"))
    val nested = new StructType()
      .add("s", new StructType().add("x", DecimalType(28, 6)))
      .add("arr", ArrayType(DecimalType(20, 2)))
      .add("m", MapType(StringType, DecimalType(38, 0)))
      .add("ok", DecimalType(10, 2))
    assert(Verify.wideDecimals(nested).toSet == Set(
      "s.x: DecimalType(28,6)", "arr[]: DecimalType(20,2)", "m<value>: DecimalType(38,0)"))
  }
}
