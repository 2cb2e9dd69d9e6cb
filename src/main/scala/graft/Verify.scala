package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Paths within `dt` holding a decimal at ANY precision. The driver's
    * two readers canonicalize decimals asymmetrically at every width:
    * pyarrow (Spark-dump side) surfaces parquet decimals as
    * `decimal.Decimal` with the declared scale's trailing zeros
    * ("194.280000"), while the oracle side surfaces a float ("194.28") —
    * identical values, different canonical strings, hash FAIL. Rounds 8–9
    * chased this as a precision->18/int128 problem; round 9's empirical
    * re-check (all 3,600 q140 rows red on an int64-backed decimal(18,6))
    * showed the real invariant: NO DecimalType may reach a dump schema.
    * Sum in decimal internally for reduce-order exactness, then cast the
    * final projection to double (or bigint micros) on BOTH sides. Verify
    * refuses to dump offenders (fail loudly at build time, not as a red
    * hash row at merge time); SparkEntrySpec gates the same rule in
    * `sbt test`.
    */
  def decimalColumns(dt: org.apache.spark.sql.types.DataType,
                     path: String = ""): Seq[String] = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => s.fields.toSeq.flatMap(f =>
        decimalColumns(f.dataType, if (path.isEmpty) f.name else s"$path.${f.name}"))
      case a: ArrayType => decimalColumns(a.elementType, s"$path[]")
      case m: MapType =>
        decimalColumns(m.keyType, s"$path<key>") ++
          decimalColumns(m.valueType, s"$path<value>")
      case d: DecimalType => Seq(s"$path: $d")
      case _ => Nil
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional builder-side filter: only dump queries matching args(2) —
    // same contract as SPARK_GRAFT_BENCH_FILTER (comma-separated substring
    // alternatives, empty segments dropped, empty/absent = all; see
    // BenchUtil.parseNameFilters). The driver always calls with exactly
    // two args → no-op there. Round 18: was a single substring, which
    // could not name a 20-query subset for the sf1 spot-verify.
    val nameFilters = BenchUtil.parseNameFilters(args.lift(2).getOrElse(""))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Root the oracle-aux dumps (persisted models/indexes the DuckDB oracle
    // reads back) under THIS run's out_dir: build and check then share one
    // tree and the compare never depends on a /tmp surviving between
    // processes. The oracle SQL carries Tables.AuxPlaceholder instead of an
    // absolute path; it is substituted below when oracle_sql.json is dumped.
    val auxDir = new java.io.File(outDir, "oracle_aux").getAbsolutePath
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.graft.oracle.auxDir", auxDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    BenchUtil.autoSizeForData(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    // A registered query that throws is a SHIPPED BUG, not a footnote: dump
    // everything (so the driver still gets the other results), then exit
    // nonzero so the failure can't slide through a snapshot unnoticed.
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.filter(q =>
      BenchUtil.matchesFilter(q._1, nameFilters)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val decs = decimalColumns(df.schema)
        if (decs.nonEmpty) throw new IllegalStateException(
          s"dump schema has DecimalType columns (${decs.mkString(", ")}) — " +
            "pyarrow surfaces parquet decimals with declared-scale trailing " +
            "zeros while the oracle surfaces floats; cast the final " +
            "projection to double (or bigint micros) on both sides")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace(Tables.AuxPlaceholder, auxDir))}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[verify] ${failed.size} queries FAILED: " +
        failed.mkString(", "))
      sys.exit(1)
    }
  }
}
