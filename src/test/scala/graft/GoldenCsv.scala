package graft

/** Shared CSV snapshot format for the golden drift pins: header + one
  * comma-joined line per row, floats in pandas' shortest-round-trip style
  * (whole doubles bare). Used by GoldenDriftSpec to compare and by
  * GoldenDump to (re)generate the pinned resources.
  */
object GoldenCsv {

  def asCsv(name: String): Seq[String] = {
    val spark = SparkTestSession.spark
    val df = SparkEntry.queries(name)(spark, SparkTestSession.sfDir)
    val header = df.columns.mkString(",")
    def cell(v: Any): String = v match {
      case d: Double if d == d.floor && math.abs(d) < 1e15 && d.toString.endsWith(".0") =>
        d.toString.dropRight(2)
      case x => String.valueOf(x)
    }
    header +: df.collect().map(_.toSeq.map(cell).mkString(",")).toSeq
  }
}

/** Regenerate golden resources: `sbt "Test/runMain graft.GoldenDump q34_approx_distinct ..."`.
  * Writes to src/test/resources/golden/<name>.csv — review the diff before
  * committing; a changed golden is a conscious behavior change.
  */
object GoldenDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GoldenDump <query-name>...")
    val root = java.nio.file.Paths.get("src/test/resources/golden")
    java.nio.file.Files.createDirectories(root)
    args.foreach { name =>
      val lines = GoldenCsv.asCsv(name)
      val p = root.resolve(s"$name.csv")
      java.nio.file.Files.write(p,
        String.join("\n", lines: _*).concat("\n").getBytes("UTF-8"))
      println(s"wrote ${p} (${lines.size - 1} rows)")
    }
    // Version sidecar: the pins are outputs of THIS Spark build. A jar
    // refresh could silently shift approximate results (sketch internals,
    // hash seeds); GoldenDriftSpec fails fast on a version mismatch so a
    // bump forces a conscious regeneration + diff review.
    java.nio.file.Files.write(root.resolve("_spark_version.txt"),
      (org.apache.spark.SPARK_VERSION + "\n").getBytes("UTF-8"))
    SparkTestSession.spark.stop()
  }
}
