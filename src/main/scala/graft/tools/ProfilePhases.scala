package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-phase attribution for any registered query: splits one
  * execution's wall time into DataFrame construction (builder code +
  * analysis), optimization + physical planning (forced via
  * `executedPlan`), and execution (noop write). ProfileStages shows the
  * driver/task split; this shows WHERE the driver part goes — a stable
  * gap in `exec` that tasks don't account for is per-job scheduling or
  * driver-side compute inside the builder (model training, bounded
  * collects), while a large `plan` is Catalyst cost (oversized literal
  * trees, rule churn). Diagnostic only; no query path depends on this.
  *
  * Usage: runMain graft.tools.ProfilePhases <sfDir> <runs> <substr>[,<substr>…]
  */
object ProfilePhases {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val filters = args.lift(2).getOrElse("").split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile-phases")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.BenchUtil.autoSizeForData(spark, sfDir)

    val names = graft.SparkEntry.queries.keys.toSeq
      .filter(n => filters.isEmpty || filters.exists(n.contains)).sorted
    names.headOption.foreach(n => graft.BenchUtil.execNoop(spark, n, sfDir, "phases")) // warmup
    println(f"${"query"}%-36s run  build(s)  plan(s)  exec(s)  total(s)")
    names.foreach { n =>
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        df.queryExecution.analyzed // force analysis with construction
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force optimize + physical plan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        println(f"$n%-36s  $i%2d  ${(t1 - t0) / 1e9}%7.3f  ${(t2 - t1) / 1e9}%7.3f  ${(t3 - t2) / 1e9}%7.3f  ${(t3 - t0) / 1e9}%7.3f")
      }
    }
    spark.stop()
  }
}
