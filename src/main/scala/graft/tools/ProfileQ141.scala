package graft.tools

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Builder-side decomposition of q141 (streamed sessions) — the steepest
  * measured sf0.1→sf1 exponent (0.43 in docs/SCALE_MEASURED.md). Re-runs
  * the sessionsStreamed stages with per-stage timers so the growth can be
  * attributed: staging write, bounds scan, the StreamingQuery itself, and
  * the output readback. Optionally swaps the state store provider
  * (`rocksdb` arg) to separate state-churn cost from scan/shuffle cost.
  *
  * Usage: runMain graft.tools.ProfileQ141 <sfDirA> <sfDirB> [rocksdb]
  */
object ProfileQ141 {

  def main(args: Array[String]): Unit = {
    val dirA = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dirB = args.lift(1).getOrElse("/tmp/graft_scale/sf1")
    val rocks = args.contains("rocksdb")
    val parts = args.find(_.startsWith("parts=")).map(_.drop(6).toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile-q141")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (rocks) spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    Seq(dirA, dirB).foreach { dir =>
      println(s"== $dir (rocksdb=$rocks, parts=$parts) ==")
      (1 to 3).foreach { i => profile(spark, dir, i, parts) }
    }
    spark.stop()
  }

  private def time[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  /** The sessionsStreamed stages, inlined with timers (kept in lockstep
    * with EventStreamJobs.sessionsStreamed — a diagnostic mirror, not a
    * second implementation on any query path).
    */
  private def profile(spark: SparkSession, dir: String, run: Int,
                      parts: Int): Unit = {
    import graft.streaming.EventStreamJobs
    val gapMs = 30 * 60 * 1000L
    val scratch = s"${graft.Tables.scratchDir(spark)}/profile_q141"
    val scratchP = new org.apache.hadoop.fs.Path(scratch)
    val fs = scratchP.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(scratchP, true)
    println(s"-- run $run")
    val ev = graft.Tables.events(spark, dir)
    time("stage: write watch files") {
      ev.repartition(2).write.parquet(s"$scratch/watch")
    }
    // footer-only bounds over the staged parquet, mirroring the
    // production path (sessionsStreamed reads min/max of the BARE ts
    // column with aggregate pushdown on — parquet footers, near-constant
    // cost; a unix_micros-wrapped scan over the source table defeats the
    // pushdown and would misattribute linear growth to this stage)
    val (minUs, maxUs) = time("stage: bounds (footers)") {
      val key = "spark.sql.parquet.aggregatePushdown"
      val old = spark.conf.get(key)
      spark.conf.set(key, "true")
      try spark.read.parquet(s"$scratch/watch").agg(min(col("ts")), max(col("ts")))
        .head() match {
          case r => (EventStreamJobs.unixMicrosOf(r.get(0)),
            EventStreamJobs.unixMicrosOf(r.get(1)))
        }
      finally spark.conf.set(key, old)
    }
    val spanMs = (maxUs - minUs) / 1000L
    val delayMs = spanMs + 3600L * 1000
    val sentinelUs = maxUs + (delayMs + gapMs + 3600L * 1000) * 1000L
    val watchP = new org.apache.hadoop.fs.Path(s"$scratch/watch")
    def parquetFiles() = fs.listStatus(watchP)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath.getName).toSet
    val before = parquetFiles()
    time("stage: sentinel append") {
      // one partition → exactly one part file, matching production
      // (spark.range(1) under local[N] adds an empty second part file,
      // which would shift the mirror's micro-batch boundaries)
      spark.range(0, 1, 1, 1).select(lit(999999999L).as("event_id"),
          timestamp_micros(lit(sentinelUs)).as("ts"), lit(-1L).as("user_id"),
          lit("view").as("event_type"), lit(0.0).as("value"), lit("{}").as("props"))
        .write.mode("append").parquet(s"$scratch/watch")
      (parquetFiles() -- before).foreach { name =>
        val p = new org.apache.hadoop.fs.Path(watchP, name)
        fs.setTimes(p, fs.getFileStatus(p).getModificationTime + 60000L, -1)
      }
    }
    val counts = EventStreamJobs.sessionWindowCounts(
      EventStreamJobs.readEvents(spark, s"$scratch/watch", maxFilesPerTrigger = 2),
      gapMs, s"$delayMs milliseconds")
    val query = time("stage: streaming query") {
      val key = "spark.sql.shuffle.partitions"
      val old = spark.conf.get(key)
      spark.conf.set(key, parts.toString)
      try {
        val q = counts.writeStream
          .outputMode("append")
          .option("checkpointLocation", s"$scratch/ckpt")
          .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
            batch.coalesce(1).write.mode("append").parquet(s"$scratch/out")
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        q
      } finally spark.conf.set(key, old)
    }
    query.recentProgress.foreach { p =>
      println(f"    batch ${p.batchId}%2d rows=${p.numInputRows}%8d " +
        f"batchMs=${p.batchDuration}%6d " +
        s"stateRows=${p.stateOperators.headOption.map(_.numRowsTotal).getOrElse(-1L)} " +
        s"commitMs=${p.stateOperators.headOption.map(_.commitTimeMs).getOrElse(-1L)}")
    }
    time("stage: readback + sort") {
      spark.read.parquet(s"$scratch/out")
        .filter(col("user_id") >= 0)
        .orderBy(col("user_id"), col("start_ms"))
        .write.format("noop").mode("overwrite").save()
    }
    fs.delete(scratchP, true)
  }
}
