package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventsPack
import graft.streaming.EventStreamJobs

/** Batch/stream equivalence: the streaming jobs must produce the same
  * results as their EventsPack batch twins on the same parquet.
  */
class EventStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = SparkTestSession.sfDir

  test("streaming tumbling window == batch tumbling window") {
    // stage the single events.parquet file into a watchable directory
    val watch = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      watch.resolve("part-0.parquet"))
    val stream = EventStreamJobs.readEvents(spark, watch.toString)
    val q = EventStreamJobs.tumblingCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("tumbling_out")
        .orderBy(col("bucket_ms"), col("event_type")).collect().toSeq
      val want = EventsPack.tumbling(spark, dir).collect().toSeq
      assert(got == want)
    } finally q.stop()
  }

  test("stateful streaming sessionization == batch sessionization") {
    import spark.implicits._
    val batch = EventsPack.sessionize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

    // drive the stateful op in one batch through the same typed pipeline
    val events = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("tsMs"))
      .as[EventStreamJobs.SessionEvent]
    val closed = EventStreamJobs.sessionizeStream(events, 30 * 60 * 1000L)
    // flatMapGroupsWithState on a batch Dataset runs the same state logic;
    // open sessions (one per user) are not emitted, so compare closed ones.
    val got = closed.collect()
      .map(o => (o.user_id, o.session_id, o.n_events, o.start_ms, o.end_ms)).toSet
    assert(got.subsetOf(batch))
    // every user's non-final session must be present
    val nUsers = events.select(col("user_id")).distinct().count()
    assert(got.size == batch.size - nUsers)
  }
}
