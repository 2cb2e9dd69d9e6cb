package graft.tools

import org.apache.spark.sql.SparkSession

/** Builder-side micro-batch cost attribution for the three gated streaming
  * queries: runs each job, then dumps the engine's own per-batch
  * `durationMs` breakdown (triggerExecution, queryPlanning, walCommit,
  * addBatch, getBatch, latestOffset, commitOffsets) from the query
  * progress log — the ground truth for where the fixed per-batch cost
  * sits. Diagnostic only.
  *
  * Usage: runMain graft.tools.ProfileStreaming <sfDir> [runs]
  */
object ProfileStreaming {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile-streaming")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.BenchUtil.autoSizeForData(spark, sfDir)

    import graft.streaming.EventStreamJobs
    val jobs: Seq[(String, () => (org.apache.spark.sql.streaming.StreamingQuery,
        org.apache.spark.sql.DataFrame))] = Seq(
      "q136" -> (() => EventStreamJobs.tumblingCountsStreamed(spark, sfDir)),
      "q141" -> (() => EventStreamJobs.sessionsStreamed(spark, sfDir)),
      "q148" -> (() => EventStreamJobs.attributionStreamed(spark, sfDir)))

    val only = args.lift(2).getOrElse("")
    jobs.filter(_._1.contains(only)).foreach { case (name, run) =>
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        val (q, df) = run()
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"== $name run $i wall $wall%.3f s, ${q.recentProgress.length} batches")
        q.recentProgress.foreach { p =>
          val d = p.durationMs
          println(s"   batch ${p.batchId}: rows=${p.numInputRows} " +
            s"trigger=${d.get("triggerExecution")} addBatch=${d.get("addBatch")} " +
            s"getBatch=${d.get("getBatch")} latestOffset=${d.get("latestOffset")} " +
            s"plan=${d.get("queryPlanning")} wal=${d.get("walCommit")} " +
            s"commit=${d.get("commitOffsets")}")
        }
      }
    }
    spark.stop()
  }
}
