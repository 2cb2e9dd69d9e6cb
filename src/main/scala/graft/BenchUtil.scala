package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Measurement helpers shared by the two timing harnesses ([[Bench]], the
  * driver-facing benchmark, and [[graft.tools.ScaleRehearsal]], the A/B
  * sf-scaling probe). One definition keeps their numbers comparable: a
  * change to how a query is materialized or how a median is taken must hit
  * both tools or their outputs silently stop meaning the same thing.
  */
object BenchUtil {

  /** First three fields of /proc/loadavg ("" off-Linux) — stamped into
    * reports so a contended sample is identifiable after the fact.
    */
  def loadavg(): String =
    try Files.readString(Paths.get("/proc/loadavg")).trim
      .split(" ").take(3).mkString(" ")
    catch { case _: Throwable => "" }

  /** One fully-materialized timed run of a registered query through the
    * noop sink (a count() would let Catalyst prune aggregates and
    * under-measure). Returns wall seconds, or -1.0 on failure (logged with
    * `tag` so the two harnesses' stderr stays distinguishable).
    */
  def execNoop(spark: SparkSession, name: String, dir: String, tag: String): Double = {
    val t0 = System.nanoTime()
    try SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable =>
      System.err.println(s"[$tag] $name @ $dir failed: ${e.getMessage}")
      return -1.0
    }
    (System.nanoTime() - t0) / 1e9
  }

  /** Median of ASCENDING-sorted samples; -1.0 when empty (the failed-run
    * sentinel both harnesses filter on).
    */
  def median(xs: Seq[Double]): Double =
    if (xs.isEmpty) -1.0
    else if (xs.size % 2 == 1) xs(xs.size / 2)
    else (xs(xs.size / 2 - 1) + xs(xs.size / 2)) / 2.0

  /** Fixed-decimal formatting under Locale.ROOT: the default locale's
    * decimal separator may be ',' which would make formatted numbers
    * invalid JSON.
    */
  def fmt(v: Double, decimals: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${decimals}f",
      java.lang.Double.valueOf(v))
}
