package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: one JSON line with per-query and total
  * wall-clock seconds over SparkEntry.queries on SPARK_GRAFT_SF_DIR.
  *
  * Each query is fully materialized through the noop sink (a count() would
  * let Catalyst prune aggregates/projections and under-measure). Every
  * query runs SPARK_GRAFT_BENCH_RUNS times (default 3) in one JVM and
  * reports the per-query MEDIAN — single samples at local[32] swing 2×
  * with host contention, and medians are what rounds get compared on.
  * The first query of the first pass is preceded by one untimed warmup so
  * JVM/codegen startup lands on no query's number.
  *
  * The JSON line is printed to stdout (last line) AND written to
  * BENCH_LOCAL.json next to the repo (env SPARK_GRAFT_BENCH_OUT to move
  * it) — log-tail scraping truncates long lines, the file never does.
  * `loadavg` records /proc/loadavg at start+end so a contended sample is
  * identifiable after the fact.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_LOCAL.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def loadavg(): String =
      try Files.readString(Paths.get("/proc/loadavg")).trim.split(" ").take(3).mkString(" ")
      catch { case _: Throwable => "" }

    def exec(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val load0 = loadavg()
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.headOption.foreach(exec) // untimed warmup
    // pass-ordered (all queries, then repeat): back-to-back repeats of one
    // query would overstate cache warmth relative to how the driver runs it
    val samples = (1 to runs).flatMap(_ => names.map(n => n -> exec(n)))
      .groupBy(_._1).view.mapValues(_.map(_._2).filter(_ >= 0.0).sorted).toMap
    def median(xs: Seq[Double]): Double =
      if (xs.isEmpty) -1.0 else xs(xs.size / 2)
    val medians = names.map(n => n -> median(samples.getOrElse(n, Nil)))
    val qs = medians.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = medians.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","runs":$runs,"loadavg_start":"$load0","loadavg_end":"${loadavg()}"}"""
    try Files.writeString(Paths.get(outPath), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath: $e") }
    println(json)
    spark.stop()
  }
}
