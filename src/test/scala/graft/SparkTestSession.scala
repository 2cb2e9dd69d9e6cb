package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (cheap, avoids per-suite JVM
  * warmup). local[4] + 4 shuffle partitions keeps tiny-SF tests fast.
  */
object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"
}
