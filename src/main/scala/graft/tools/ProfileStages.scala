package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Builder-side wall-time attribution for any registered query: runs each
  * matched query N times through the bench's noop sink with a listener
  * counting jobs/stages/tasks and summing executor task time. The gap
  * between wall time and (task time / slots) is driver-side cost — plan
  * analysis, AQE re-planning, codegen compilation, job scheduling — the
  * fixed-overhead pool that dominates sub-second queries and does NOT
  * shrink with data. Diagnostic only; no query path depends on this.
  *
  * Usage: runMain graft.tools.ProfileStages <sfDir> <runs> <substr>[,<substr>…]
  */
object ProfileStages {

  private class Acc extends SparkListener {
    var jobs, stages, tasks = 0
    var taskTimeMs = 0L
    var launchGapMs = 0L // sum of (stage submit → first task) latencies
    val stageSubmit = mutable.Map[Int, Long]()
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
      stages += 1
      stageSubmit(s.stageInfo.stageId) = System.currentTimeMillis()
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks += 1
      if (t.taskMetrics != null) taskTimeMs += t.taskMetrics.executorRunTime
    }
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0; stageSubmit.clear() }
  }

  private def gcMs(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val filters = args.lift(2).getOrElse("").split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile-stages")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // ad-hoc conf overrides for A/B probes: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    sys.env.getOrElse("SPARK_GRAFT_EXTRA_CONF", "").split(";")
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // default to the harness's data-proportional sizing, but let an
    // explicit EXTRA_CONF A/B probe own the knobs it sets
    if (!sys.env.contains("SPARK_GRAFT_EXTRA_CONF"))
      graft.BenchUtil.autoSizeForData(spark, sfDir)
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)

    val names = graft.SparkEntry.queries.keys.toSeq
      .filter(n => filters.isEmpty || filters.exists(n.contains)).sorted
    names.headOption.foreach(n => graft.BenchUtil.execNoop(spark, n, sfDir, "profile")) // warmup
    println(f"${"query"}%-36s run   wall(s)  jobs stages tasks  taskTime(s)  task/slots(s)")
    names.foreach { n =>
      (1 to runs).foreach { i =>
        // listenerBus is private; a short sleep lets the async bus drain
        // between runs (diagnostic tolerance, not a correctness need)
        Thread.sleep(300)
        acc.reset()
        val gc0 = gcMs()
        val w = graft.BenchUtil.execNoop(spark, n, sfDir, "profile")
        Thread.sleep(300)
        println(f"$n%-36s  $i%2d  $w%8.3f  ${acc.jobs}%4d ${acc.stages}%5d ${acc.tasks}%5d  ${acc.taskTimeMs / 1e3}%10.3f  ${acc.taskTimeMs / 1e3 / cpus.toInt}%12.3f  gc=${(gcMs() - gc0) / 1e3}%.2f")
      }
    }
    spark.stop()
  }
}
