package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.{BenchUtil, SparkEntry}

/** Scale rehearsal runner — measures how each headline query's wall-clock
  * grows from one scale factor to another (default sf0.1 → the sf1-sized
  * dataset emitted by [[ScaleData]]), converting SCALE.md's plan-shape
  * arguments into observed scaling exponents.
  *
  * Methodology mirrors [[graft.Bench]]: every query materializes through
  * the noop sink, runs `runs` pass-ordered repetitions per dir, and
  * reports the per-(query, dir) MEDIAN. Both dirs are exercised once
  * untimed up front so JIT/codegen warmth is equal when timing starts.
  * For each query it reports ratio = t(B)/t(A) and the empirical exponent
  * e = ln(ratio)/ln(factor) — e≈1 is linear scaling, e<1 sublinear (fixed
  * overheads still dominate at B), e>1 superlinear (a pair-count or
  * shuffle blowup; investigate before calling the operator scale-ready).
  *
  * Usage: `runMain graft.tools.ScaleRehearsal [dirA dirB factor runs]`,
  * query set via SPARK_GRAFT_SCALE_QUERIES (csv of registry names).
  * Writes a markdown table to docs/SCALE_MEASURED.md and prints one JSON
  * line for machine consumption.
  */
object ScaleRehearsal {

  /** Default rehearsal set: the dedup/ANN/percentile family plus the
    * costliest relational/wide-column representatives from the round-6
    * clean-host bench — the queries whose 100 TB story SCALE.md argues.
    */
  private val DefaultQueries: Seq[String] = Seq(
    "q01_traffic_rollup",
    "q17_shipping_priority",
    "q65_dedup_exact",
    "q66_dedup_jaccard",
    "q67_dedup_minhash_lsh",
    "q70_ann_bruteforce_topk",
    "q73_dedup_embedding_lsh",
    "q85_percentiles",
    "q104_widecol_tombstones",
    "q105_weighted_percentiles",
    "q106_ann_ivf_trained_topk",
    "q116_semantic_dedup",
    "q117_incremental_dedup",
    "q122_dup_spans",
    "q124_dedup_keeplist_lsh",
    "q128_ann_quantized_topk",
    "q134_source_length_percentiles",
    "q135_incremental_dedup_storeddf",
    // events/time family (round 8): gap-sessionization windows, the dense
    // resample spine, and the real streaming engine runs
    "q57_sessionize",
    "q140_resample_gapfill",
    "q141_streamed_sessions",
    "q148_streamed_attribution",
    // round-8 pair-join ops: deletion-variant fuzzy join (names
    // decorrelated per replica in ScaleData) and winnowing fingerprints
    "q142_fuzzy_name_pairs",
    "q147_winnowing_pairs")

  def main(args: Array[String]): Unit = {
    val dirA = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dirB = args.lift(1).getOrElse("/tmp/graft_scale/sf1")
    val factor = args.lift(2).map(_.toDouble).getOrElse(10.0)
    val runs = args.lift(3).map(_.toInt).getOrElse(3)
    val outMd = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT",
      "/root/repo/docs/SCALE_MEASURED.md")

    val names = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultQueries)
      .filter { n =>
        val ok = SparkEntry.queries.contains(n)
        if (!ok) System.err.println(s"[scale] unknown query skipped: $n")
        ok
      }

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scale-rehearsal")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(name: String, dir: String): Double = {
      // re-size split floors to THIS dir before each sample: A and B
      // interleave, and each must run with its own data-proportional
      // sizing (the walk over ~10 files is microseconds)
      BenchUtil.autoSizeForData(spark, dir)
      BenchUtil.execNoop(spark, name, dir, "scale")
    }

    val load0 = BenchUtil.loadavg()
    // equalize warmth: one untimed pass of the first query per dir
    names.headOption.foreach { n => exec(n, dirA); exec(n, dirB) }

    // pass-ordered across runs (back-to-back repeats of one query would
    // overstate cache warmth), but INTERLEAVED A,B within each query: the
    // exponent is a ratio of the pair, and ambient load drifts over the
    // ~minutes a pass takes — an all-A-then-all-B pass hands the whole
    // drift to the B side (round 9 measured q17 at 0.50 suite vs 0.11
    // isolated, q73 0.57 vs 0.17 for exactly this reason). Adjacent A,B
    // samples see the same ambient conditions, so drift cancels in the
    // ratio instead of masquerading as a scaling exponent.
    val samples: Map[(String, String), Seq[Double]] =
      (1 to runs).flatMap { _ =>
        names.flatMap(n => Seq(dirA, dirB).map(d => (n, d) -> exec(n, d)))
      }.groupBy(_._1).view
        .mapValues(_.map(_._2).filter(_ >= 0.0).sorted).toMap

    def f(v: Double): String = BenchUtil.fmt(v, 3)
    def f2(v: Double): String = BenchUtil.fmt(v, 2)

    val rows = names.map { n =>
      val a = BenchUtil.median(samples.getOrElse((n, dirA), Nil))
      val b = BenchUtil.median(samples.getOrElse((n, dirB), Nil))
      val ratio = if (a > 0 && b > 0) b / a else -1.0
      // guard every non-finite source (failed query → ratio -1, factor=1
      // → ln(1)=0): a bare NaN/Infinity token would make the machine
      // JSON line below unparseable and lose the whole run
      val expRaw =
        if (ratio > 0 && factor > 1.0) math.log(ratio) / math.log(factor)
        else Double.NaN
      val exp = if (java.lang.Double.isFinite(expRaw)) expRaw else -99.0
      (n, a, b, ratio, exp)
    }

    val loadEnd = BenchUtil.loadavg()
    val md = new StringBuilder
    md.append("# SCALE_MEASURED — observed sf-scaling of the headline queries\n\n")
    md.append(s"Generated by `graft.tools.ScaleRehearsal` ($runs-run medians, ")
    md.append(s"noop sink, local[32], AQE on).\n")
    md.append(s"A = `$dirA`, B = `$dirB` (≈${factor.toInt}× rows via ")
    md.append("`graft.tools.ScaleData` key-offset replication; text/embedding\n")
    md.append("replicas decorrelated so pair counts scale linearly — see its ")
    md.append("scaladoc).\nExponent e = ln(tB/tA)/ln(")
    md.append(s"${factor.toInt}): e≈1 linear, e<1 fixed-overhead-dominated, ")
    md.append("e>1 superlinear (flag); −99 = query failed on a dir.\n")
    md.append(s"loadavg start `$load0` end `$loadEnd`.\n\n")
    md.append("| query | t(A) s | t(B) s | ratio | exponent |\n")
    md.append("|---|---|---|---|---|\n")
    rows.foreach { case (n, a, b, r, e) =>
      md.append(s"| $n | ${f(a)} | ${f(b)} | ${f2(r)} | ${f2(e)} |\n")
    }
    // regeneration replaces only the header + table; hand-written analysis
    // sections ("## ..." onward, e.g. the q141 decomposition) survive
    val appendix =
      try {
        val old = Files.readString(Paths.get(outMd))
        val i = old.indexOf("\n## ")
        if (i >= 0) old.substring(i) else ""
      } catch { case _: Throwable => "" }
    // create the parent first — failing AFTER the multi-minute A/B
    // rehearsal would discard every measurement
    Option(Paths.get(outMd).toAbsolutePath.getParent)
      .foreach(Files.createDirectories(_))
    Files.writeString(Paths.get(outMd), md.toString + appendix)
    println(md.toString)

    val json = rows.map { case (n, a, b, r, e) =>
      s""""$n":{"a":${f(a)},"b":${f(b)},"ratio":${f2(r)},"exp":${f2(e)}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_rehearsal","dirA":"$dirA","dirB":"$dirB",""" +
      s""""factor":$factor,"runs":$runs,"loadavg_start":"$load0",""" +
      s""""loadavg_end":"$loadEnd","queries":$json}""")
    spark.stop()
  }
}
