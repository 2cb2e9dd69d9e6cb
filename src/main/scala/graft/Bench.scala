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
  * Output goes to two places. The FULL report (full query names, full
  * precision) is written to BENCH_LOCAL.json (env SPARK_GRAFT_BENCH_OUT to
  * move it) and printed first. The LAST stdout line is a compact variant —
  * short `qNN` keys, 3-decimal seconds — sized to fit entirely inside the
  * driver's 2000-char stdout tail (the full line is ~3 KB and was arriving
  * head-truncated, hence `parsed: null` three rounds running). Queries
  * that fail every run are listed under "failed" (and excluded from the
  * total) instead of being silently dropped. `loadavg` records
  * /proc/loadavg at start+end so a contended sample is identifiable;
  * `ext_cores` stamps each query with the `[max, mean]` external-busy-cores
  * pair over its timed samples (see [[BenchUtil.cpuSnap]]) so a
  * contaminated query is identifiable — and sustained-vs-spike adjudicable —
  * from the artifact alone, no worktree A/B needed. The artifact also
  * carries a capture-level `capture_profile` verdict ("clean"/"degraded"
  * plus the flags that fired — see [[BenchUtil.captureProfile]]) and a
  * `capture_class` host-window sub-class ("pristine" zero-co-tenancy vs
  * "ambient" — see [[BenchUtil.captureClass]]; this host's two measured
  * clean states differ ~14% in total, so the clean record must say which
  * state it holds), and a fully-clean unfiltered zero-failure capture
  * additionally overwrites BENCH_CLEAN.<sf>.json
  * (env SPARK_GRAFT_BENCH_CLEAN_OUT) — the representative-performance
  * record that degraded windows can't clobber while BENCH_LOCAL.json
  * stays strict last-run output.
  *
  * CONTENTION DEFENSE: medians still read 2–3× high when another process
  * owns the host for a whole pass (round 8: two same-code runs at similar
  * loadavg differed 19% total, 3× on single queries). A per-SF history
  * file (BENCH_HISTORY.<sf>.json, committed) records the best median each
  * query has ever posted on this code line; any query whose median lands
  * above 2× its history (and above 0.5 s — sub-second 2× is noise, not
  * contention) is re-run for another `runs` samples once the rest of the
  * suite has finished (the contention burst has usually moved on by then)
  * and keeps the better median. A query whose ext_cores stamp shows an
  * external process at ≥1 busy core overlapped a sample is also retried
  * when its median sits above its history floor — direct contamination
  * evidence, caught even when the damage stays under the 2× trigger
  * (see [[retrySet]]) — PROVIDED the intruder is co-tenant-confirmed by
  * the query's steal stamp (see [[retryExtStamps]]): an in-guest ext
  * reading (the query's own kernel writeback, a sibling JVM) follows
  * the query into its retry window, so that retry re-measures the same
  * contamination and injects a back-to-back-warm median for nothing.
  * The retried set is reported under
  * "retried", and the history is re-written as the element-wise minimum
  * after every run, so it converges to clean-host numbers and never
  * ratchets upward. Cap: the 12 worst offenders by absolute excess —
  * a history file from a much faster host must not trigger a full
  * second suite.
  */
object Bench {

  /** Parse a BENCH_HISTORY/BENCH_LOCAL-style line back to per-query medians.
    * The files are self-written (one flat JSON object whose only numeric
    * pairs are `"qNN_name":seconds`, plus string fields like "sf"), so a
    * regex pull of exactly those pairs is total — and importantly IGNORES
    * string fields, the "failed"/"retried" arrays, any qNN short-key
    * compact line content that lacks the `_name` suffix, and the
    * "ext_cores"/"ext_cores_retry" stamp objects (whose keys ARE full
    * query names, so both are excised before the match — a BENCH_LOCAL
    * line fed as history must yield medians, not contamination stamps).
    */
  def parseHistory(text: String): Map[String, Double] = {
    val t = text.replaceAll("\"ext_cores[a-z_]*\":\\{[^}]*\\}", "")
    "\"(q[0-9]+_[a-z0-9_]+)\":([0-9.eE+-]+)".r.findAllMatchIn(t)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  /** The post-suite retry set: (name, pass-ordered median, excess-over-
    * history) triples, worst excess first. Three triggers compose:
    *
    *  - history defense: median > 2× the query's all-time floor AND
    *    > 0.5 s (sub-second 2× is noise, not contention);
    *  - ext-stamp defense: an external process at ≥1 busy core overlapped
    *    one of the query's samples (callers pass stamps already filtered
    *    to co-tenant-confirmed intruders — see [[retryExtStamps]]; this
    *    function stays agnostic of HOW a stamp was confirmed) AND the
    *    median sits above its floor —
    *    one contaminated sample drags a 3-sample median even when the
    *    result stays UNDER the 2× trigger (round-14 capture: an intruder
    *    burst at 1.2+ cores over q123–q125 fired zero history retries);
    *    the 0.5 s noise floor does not apply here because the stamp is
    *    direct evidence of contention, not an inference from the timing.
    *    A HISTORY-LESS stamped query still retries (nothing proves its
    *    median clean) but ranks at excess 0 — its raw median is not a
    *    regression measure, so on a first capture under load it must not
    *    crowd genuine history regressions out of the shared cap;
    *  - every query that failed all pass-ordered runs (transient crash).
    *
    * The first two are capped together at the 12 worst by absolute excess
    * (a history file from a much faster host must not trigger a second
    * full suite); failures always retry.
    */
  def retrySet(medians: Seq[(String, Double)], history: Map[String, Double],
               extStamps: Map[String, Double]): Seq[(String, Double, Double)] = {
    val hot = medians.collect {
      case (n, m) if m > 0.5 && history.get(n).exists(h => m > 2 * h) =>
        (n, m, m - history(n))
    }
    val flagged = hot.map(_._1).toSet
    val extHit = medians.collect {
      case (n, m) if m >= 0 && !flagged(n) &&
        extStamps.getOrElse(n, 0.0) >= 1.0 &&
        history.get(n).forall(h => m > h) =>
        (n, m, history.get(n).map(m - _).getOrElse(0.0))
    }
    (hot ++ extHit).sortBy(-_._3).take(12) ++
      medians.collect { case (n, m) if m < 0 => (n, m, 0.0) }
  }

  /** The ext-stamp evidence [[retrySet]] consumes: each query's max
    * pass-ordered external-cores reading, kept only where the query's
    * steal stamp co-tenant-confirms the intruder
    * ([[BenchUtil.stealConfirms]] over the query's max steal reading —
    * the same [max over samples] aggregation the artifact's
    * "ext_cores"/"ext_cores_steal" stamps carry, so a reader holding
    * BENCH_LOCAL.json can re-derive every fired/not-fired retry from the
    * two stamp objects alone). Both maxima are [[BenchUtil.round2]]-
    * rounded BEFORE gating — the gates must consume the same 2-decimal
    * values the stamps carry, or boundary readings (ext 0.995 stamping
    * 1.00, steal 0.495 stamping 0.50) would make the stamps contradict
    * the fired/not-fired set. Queries whose steal samples are empty OR
    * fewer than their ext samples confirm conservatively (the pre-steal
    * retry behavior): steal and ext come from the same /proc snapshots,
    * so a count mismatch means the steal read failed on some sample —
    * possibly exactly the contaminated one — and the artifact omits the
    * partial steal stamp for that query (see the stamp filter in main),
    * so absent-stamp = conservative-confirm stays reader-derivable.
    * Pinned in HarnessSpec.
    */
  def retryExtStamps(ext: Map[String, List[Double]],
                     steal: Map[String, List[Double]]): Map[String, Double] =
    ext.collect {
      case (n, xs) if xs.nonEmpty && BenchUtil.stealConfirms(
        steal.get(n).filter(st => st.size >= xs.size)
          .map(st => BenchUtil.round2(st.max))) =>
        n -> BenchUtil.round2(xs.max)
    }

  /** The history-file line. The sf field joins the query pairs through ONE
    * mkString so the empty-merged case (all queries failed, no prior
    * history) still emits valid JSON — a leading-prefix concat would leave
    * a dangling comma there. Pinned in HarnessSpec.
    */
  def historyLine(sfDir: String, merged: Seq[(String, Double)]): String =
    (s""""sf":"$sfDir"""" +: merged.map { case (n, v) => s""""$n":$v""" })
      .mkString("{", ",", "}\n")

  /** Element-wise-min merge of prior history with this run's medians,
    * restricted to currently-registered names: a history-only entry from a
    * RENAMED query (e.g. the old q105_percentiles_histogram) would
    * otherwise persist forever as dead weight, while a live name absent
    * from a FILTERED run still keeps its prior best. Pinned in HarnessSpec.
    */
  def mergeHistory(history: Map[String, Double], run: Map[String, Double],
                   live: Set[String]): Seq[(String, Double)] =
    (history.keySet ++ run.keySet).toSeq.sorted.filter(live).flatMap { n =>
      (history.get(n), run.get(n)) match {
        case (Some(h), Some(m)) => Some(n -> math.min(h, m))
        case (Some(h), None)    => Some(n -> h)
        case (None, Some(m))    => Some(n -> m)
        case _                  => None
      }
    }

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
    BenchUtil.autoSizeForData(spark, sfDir)

    // per-query contamination stamp (round-13 advice: adjudicating an 8 s
    // capture swing cost a worktree A/B because nothing in the artifact said
    // WHICH queries were hit): every timed sample snapshots /proc cpu
    // counters around the run and keeps, per query, every sample's external
    // busy-core reading. The artifact stamps the pair [MAX, MEAN] over the
    // query's pass-ordered samples (retry-window samples get their own
    // "ext_cores_retry" stamp): MAX is the retry trigger (one hot sample is
    // enough to drag a 3-sample median) and MEAN is the sustained-vs-spike
    // adjudicator the round-14 88.3 s capture still needed prose for — a
    // max≈mean≥1 pair reads "intruder held the whole window", max≫mean
    // reads "one-hot burst". ~0 ⇒ that query's number is host-clean;
    // fractions in between on IO-heavy/sub-second queries are their own
    // kernel-writeback floor (see the cpuSnap calibration note).
    val extSamples = scala.collection.mutable.Map[String, List[Double]]()
    // the steal component of each ext sample (see BenchUtil.stealCores):
    // stamped as "ext_cores_steal" so a ≥1-core "intruder" reading is
    // attributable to a co-tenant VM (steal ≈ ext) vs in-guest external
    // work like the query's own kernel writeback (steal ≈ 0) — the
    // latter follows the query into its retry window, so since the
    // band freeze (docs/CALIBRATION.md) it no longer fires the ext
    // retry (see retryExtStamps). Name prefix keeps it inside
    // parseHistory's ext_cores excision.
    val stealSamples = scala.collection.mutable.Map[String, List[Double]]()
    def exec(name: String): Double = {
      val snap0 = BenchUtil.cpuSnap()
      val t0 = System.nanoTime
      val sec = BenchUtil.execNoop(spark, name, sfDir, "bench")
      val snap1 = BenchUtil.cpuSnap()
      val elapsed = (System.nanoTime - t0) / 1e9
      val ext = BenchUtil.extCores(snap0, snap1, elapsed)
      if (ext >= 0)
        extSamples.updateWith(name)(p => Some(ext :: p.getOrElse(Nil)))
      val st = BenchUtil.stealCores(snap0, snap1, elapsed)
      if (st >= 0)
        stealSamples.updateWith(name)(p => Some(st :: p.getOrElse(Nil)))
      sec
    }

    // LOAD GATE: a capture launched onto a busy host reads 19–25% hot and
    // is not comparable round-to-round. Above the threshold (1-minute
    // loadavg > SPARK_GRAFT_BENCH_LOADMAX, default 1.5) wait up to
    // SPARK_GRAFT_BENCH_LOADWAIT seconds (default 240) for the burst to
    // pass, polling every 15 s; then proceed either way — a missing bench
    // artifact is worse than an annotated contended one — and stamp the
    // verdict ("clean" / "contended") plus the gated loadavg into the JSON.
    val loadMax = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOADMAX", "1.5").toDouble
    val loadWaitS = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOADWAIT", "240").toInt
    def load1m(): Double =
      BenchUtil.loadavg().split("\\s+").headOption
        .flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(0.0)
    val gateDeadline = System.nanoTime + loadWaitS * 1000000000L
    var gatedLoad = load1m()
    while (gatedLoad > loadMax && System.nanoTime < gateDeadline) {
      System.err.println(f"[bench] load gate: loadavg $gatedLoad%.2f > $loadMax%.1f, waiting…")
      Thread.sleep(15000)
      gatedLoad = load1m()
    }
    val loadGate = if (gatedLoad > loadMax) "contended" else "clean"
    val load0 = BenchUtil.loadavg()
    // builder-side targeted timing: SPARK_GRAFT_BENCH_FILTER=percentile
    // times only matching queries (driver runs unfiltered); comma-separates
    // into alternatives ("q106,q107" matches either) for one-run set timing
    val nameFilters = BenchUtil.parseNameFilters(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_FILTER", ""))
    val names = SparkEntry.queries.keys.toSeq
      .filter(n => BenchUtil.matchesFilter(n, nameFilters)).sorted
    // CPU reference spin at suite start (twin at suite end): fixed work
    // whose wall time stretches only when the HOST withholds cycles — the
    // direct stamp for the guest-invisible slow-window class that clean
    // ext_cores pairs cannot see (see BenchUtil.cpuRefSpin). Taken before
    // the warmup so it reads the same host window the first queries get.
    val refStart = BenchUtil.cpuRefSpin()
    val memStart = BenchUtil.memRefWalk()
    val parStart = BenchUtil.parRefSpin()
    // host-stall counters (steal + PSI) bracket each capture quarter —
    // the DECOMPOSITION the triad can't give: steal-cores says the
    // hypervisor ran a co-tenant while this guest was runnable, psi_cpu
    // says guest tasks queued on vCPUs, psi_mem/psi_io say stalls were
    // memory- or IO-side. Quarter spans share the seg_ref points; the
    // last span (seg3→end) includes the retry execs by construction.
    var stallPrev = BenchUtil.stallSnap()
    var stallPrevT = System.nanoTime
    val stallSegs = scala.collection.mutable.ArrayBuffer[
      (String, (Double, Double, Double, Double))]()
    def stallMark(tag: String): Unit = {
      val now = BenchUtil.stallSnap()
      val t = System.nanoTime
      stallSegs += ((tag,
        BenchUtil.stallDeltas(stallPrev, now, (t - stallPrevT) / 1e9)))
      stallPrev = now; stallPrevT = t
    }
    // untimed warmup — bypasses the stamping wrapper so contamination during
    // JVM/codegen startup is not charged to the first query's ext_cores
    names.headOption.foreach(n => BenchUtil.execNoop(spark, n, sfDir, "bench"))
    // reset the stall-span origin AFTER the warmup (r17 ADVICE): the seg1
    // span must start where the first TIMED exec starts, or warmup/JVM-
    // startup stalls get charged to seg1's steal/PSI deltas — unlike
    // ext_cores, which already excludes the warmup by construction. The
    // triad start stamps above are deliberately pre-warmup (they read the
    // host window the first queries get); only the quarter DELTAS move.
    stallPrev = BenchUtil.stallSnap()
    stallPrevT = System.nanoTime
    // mid-suite segment stamps (r16 VERDICT): the 91.5 s capture showed a
    // starved window FADING mid-run (18.5 → 30.7 delivered cores between
    // the start/end stamps) — end-point stamps can't say which queries a
    // transient window hit, so degraded-period medians relied on the retry
    // heuristic alone. A mem_ref walk + par_ref spin (full fixed work —
    // SAME clean bands as the end-point stamps, no separate calibration)
    // now runs at the three quarter-points of the pass-ordered exec
    // sequence: ~0.45 s each clean, ~1.35 s per suite. Each stamp records
    // the exec index and the query it followed, bracketing any window to
    // a quarter-suite span. Pass-ordered execs only — retry execs happen
    // after the suite, inside the end stamps' coverage.
    val segStamps =
      scala.collection.mutable.ArrayBuffer[(Int, String, Double, Double)]()
    val totalExecs = runs * names.size
    val segEvery = math.max(1, totalExecs / 4)
    var execIdx = 0
    // pass-ordered (all queries, then repeat): back-to-back repeats of one
    // query would overstate cache warmth relative to how the driver runs it
    val samples = (1 to runs).flatMap(_ => names.map { n =>
      val r = n -> exec(n)
      execIdx += 1
      if (execIdx % segEvery == 0 && execIdx < totalExecs && segStamps.size < 3) {
        val m = BenchUtil.memRefWalk()
        val p = BenchUtil.parRefSpin()
        val cores = if (p._2 < 0 || p._1 <= 0) -1.0 else p._2 / p._1
        segStamps += ((execIdx, n, m._1, cores))
        stallMark(s"seg${segStamps.size}")
      }
      r
    }).groupBy(_._1).view.mapValues(_.map(_._2).filter(_ >= 0.0).sorted).toMap
    val medians0 = names.map(n => n -> BenchUtil.median(samples.getOrElse(n, Nil)))

    // ---- contention defense (see scaladoc) -------------------------------
    val sfTag = Paths.get(sfDir).getFileName.toString
    val historyPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_HISTORY",
      s"/root/repo/BENCH_HISTORY.$sfTag.json")
    val history: Map[String, Double] =
      (try parseHistory(Files.readString(Paths.get(historyPath)))
       catch { case _: Throwable => Map.empty[String, Double] })
    // snapshot the PASS-ORDERED sample lists BEFORE the retry decision and
    // the retry runs that append to extSamples/stealSamples: the decision
    // consumes exactly these snapshots (via retryExtStamps), and the
    // artifact's "ext_cores"/"ext_cores_steal" stamps aggregate the same
    // sets — a reader applying the SKILL.md rule ("ext max ≥1 AND steal
    // max ≥0.5 fires a retry when above floor") must never see stamps
    // that contradict the fired/not-fired retry set. Retry-window
    // contamination gets its own stamp below.
    val extPass = extSamples.toMap
    val stealPass = stealSamples.toMap
    val toRetry = retrySet(medians0, history,
      retryExtStamps(extPass, stealPass))
    val retried = toRetry.map(_._1)
    val betterOf = toRetry.map { case (n, m, _) =>
      val again = BenchUtil.median((1 to runs).map(_ => exec(n)).filter(_ >= 0.0).sorted)
      n -> (if (again >= 0.0) { if (m >= 0.0) math.min(m, again) else again } else m)
    }.toMap
    val medians = medians0.map { case (n, m) => n -> betterOf.getOrElse(n, m) }
    // suite-end twin of refStart — a degraded period that began (or ended)
    // mid-capture shows as start/end disagreement; both stretched vs the
    // clean-host calibration reads "whole capture ran slow-windowed"
    val refEnd = BenchUtil.cpuRefSpin()
    val memEnd = BenchUtil.memRefWalk()
    val parEnd = BenchUtil.parRefSpin()
    stallMark("end")

    val failed = medians.collect { case (n, v) if v < 0 => n }
    val ok = medians.filter(_._2 >= 0)
    // history := element-wise min of the PASS-ORDERED medians only. The
    // retry medians (betterOf) come from back-to-back repeats of one
    // query — systematically warmer than any honestly-ordered sample — so
    // min-merging them would ratchet the committed floor below what a
    // clean pass-ordered run can reach, flagging clean runs as suspect
    // (and re-running the retry suite) on every subsequent bench.
    val okOrdered = medians0.filter(_._2 >= 0)
    // a retried-only success (pass-ordered failed, retry passed) may SEED
    // a missing history entry — min-merge only fills, never lowers an
    // existing pass-ordered floor with a back-to-back-warm retry median.
    // When a floor already exists, log the exclusion instead of silently
    // leaving the query history-less forever.
    val medians0Map = medians0.toMap
    val retryFill = betterOf.collect {
      case (n, v) if v >= 0 && medians0Map.getOrElse(n, -1.0) < 0 &&
        !history.contains(n) => n -> v
    }
    betterOf.foreach { case (n, v) =>
      if (v >= 0 && medians0Map.getOrElse(n, -1.0) < 0 && history.contains(n))
        System.err.println(
          s"[bench] $n passed only on retry ($v s); pass-ordered floor kept")
    }
    val merged = mergeHistory(history, okOrdered.toMap ++ retryFill,
      SparkEntry.queries.keySet)
    try Files.writeString(Paths.get(historyPath), historyLine(sfDir, merged))
    catch { case e: Throwable => System.err.println(s"[bench] write $historyPath: $e") }
    val total = ok.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    def f3(v: Double): String = BenchUtil.fmt(v, 3)
    def jsonLine(qs: Seq[(String, String)], extra: String): String =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec",""" +
        s""""queries":${qs.map { case (k, v) => "\"" + k + "\":" + v }
          .mkString("{", ",", "}")},"sf":"$sfDir","runs":$runs,""" +
        s""""failed":$failedJson$extra}"""
    val retriedJson = retried.map("\"" + _ + "\"").mkString("[", ",", "]")
    // ext_cores only in the FULL artifact (the compact stdout twin must stay
    // inside the driver's 2000-char tail); 2 decimals — it's a stamp, not a
    // measurement. "ext_cores" and "ext_cores_steal" are [max, mean]
    // pairs over the query's PASS-ORDERED samples — together the exact
    // evidence the retry decision consumed (retryExtStamps applies
    // stealConfirms to the same maxima), so the stamps and the
    // fired/not-fired retry set never contradict each other for a
    // reader applying the SKILL.md rule.
    // Retry-window samples (exec calls after the decision) land in the
    // separate "ext_cores_retry" object, keyed only for retried queries —
    // they adjudicate whether a retry median itself ran clean. Arrays keep
    // both objects free of nested braces so parseHistory's single-level
    // excision regex stays total over this file format.
    def extPairJson(m: Map[String, List[Double]]): String = names.flatMap { n =>
      m.get(n).filter(_.nonEmpty).map { xs =>
        "\"" + n + "\":[" + BenchUtil.fmt(xs.max, 2) + "," +
          BenchUtil.fmt(xs.sum / xs.size, 2) + "]"
      }
    }.mkString("{", ",", "}")
    // samples are PREPENDED in exec(), so a query's retry-window samples
    // are the head of its final list, before the pass-ordered suffix
    val extRetry = extSamples.toMap.flatMap { case (n, all) =>
      val passN = extPass.get(n).map(_.size).getOrElse(0)
      val r = all.take(all.size - passN)
      if (r.nonEmpty) Some(n -> r) else None
    }
    val extJson = extPairJson(extPass)
    val extRetryJson = extPairJson(extRetry)
    // a PARTIAL steal list (fewer samples than the query's ext list —
    // the steal read failed on some sample) is omitted from the stamp:
    // retryExtStamps treats it as unreadable (conservative confirm), and
    // an absent steal stamp is exactly how the artifact spells
    // "unreadable" to a reader re-deriving the retry set
    val extStealJson = extPairJson(stealPass.filter { case (n, st) =>
      extPass.get(n).forall(xs => st.size >= xs.size) })
    // "cpu_ref"/"mem_ref": [wall, threadCpu] seconds for the fixed
    // reference spin (register-only cycles) and memory walk (DRAM
    // bandwidth) at suite start/end — keys are not query names and the
    // arrays hold no braces, so parseHistory stays total over this format
    // (pinned in HarnessSpec). Full artifact only, like ext_cores.
    def refJson(r: (Double, Double, Long)): String =
      "[" + BenchUtil.fmt(r._1, 3) + "," + BenchUtil.fmt(r._2, 3) + "]"
    // capture-level verdict from the host evidence above (triad bands,
    // pass-ordered intruder stamps, load gate — see
    // BenchUtil.captureProfile): stamped into the artifact so no consumer
    // has to re-derive "was this window representative?" from raw stamps
    val threads = Runtime.getRuntime.availableProcessors
    def deliveredCores(r: (Double, Double, Long)): Double =
      if (r._2 < 0 || r._1 <= 0) -1.0 else r._2 / r._1
    // round2 before the ≥1.0 gate: the verdict's intruder criterion must
    // consume the same 2-decimal value the ext_cores stamp carries (a
    // 0.995 reading stamps 1.00 and must flag; see retryExtStamps)
    val intruders = names.filter(n =>
      extPass.get(n).exists(xs =>
        xs.nonEmpty && BenchUtil.round2(xs.max) >= 1.0))
    // segment stamps join the verdict between the end-points (same fixed
    // work ⇒ same bands): a capture with clean ends but a degraded middle
    // must not write the clean record
    val segMem = segStamps.toSeq.zipWithIndex.map {
      case ((_, _, m, _), i) => s"seg${i + 1}" -> m }
    val segPar = segStamps.toSeq.zipWithIndex.map {
      case ((_, _, _, c), i) => s"seg${i + 1}" -> c }
    val (profile, profileFlags) = BenchUtil.captureProfile(
      Seq("start" -> refStart._1, "end" -> refEnd._1),
      ("start" -> memStart._1) +: segMem :+ ("end" -> memEnd._1),
      ("start" -> deliveredCores(parStart)) +: segPar :+
        ("end" -> deliveredCores(parEnd)),
      threads, intruders, loadGate)
    val flagsJson = profileFlags.map("\"" + _ + "\"").mkString("[", ",", "]")
    // host-WINDOW sub-class (pristine = zero co-tenancy vs ambient — see
    // BenchUtil.captureClass): stamped on EVERY capture, orthogonal to
    // the flag-based verdict, so BENCH_CLEAN records which of the two
    // clean classes it holds (a pristine 74.6 s and an ambient-clean
    // 87 s are both representative — of different host states) and a
    // degraded capture in a pristine window still says so. Gates on
    // quarter evidence only (seg cores + stall spans + all mem stamps);
    // the par start/end pair brackets JVM edge activity and reads
    // 28.5–29.4 even inside a pristine window, so it stays out.
    val captureCls = BenchUtil.captureClass(
      memStart._1 +: segMem.map(_._2) :+ memEnd._1,
      segPar.map(_._2), threads,
      stallSegs.toSeq.map(_._2._1))
    val full = jsonLine(ok.map { case (k, v) => k -> v.toString },
      s""","retried":$retriedJson,"ext_cores":$extJson,""" +
        s""""ext_cores_retry":$extRetryJson,""" +
        s""""ext_cores_steal":$extStealJson,""" +
        s""""cpu_ref":{"start":${refJson(refStart)},"end":${refJson(refEnd)}},""" +
        s""""mem_ref":{"start":${refJson(memStart)},"end":${refJson(memEnd)}},""" +
        s""""par_ref":{"start":${refJson(parStart)},"end":${refJson(parEnd)},""" +
        s""""threads":$threads},""" +
        // "seg_ref": quarter-point [exec index, query it followed, mem_ref
        // wall, delivered cores]. The query name appears as a VALUE (never
        // followed by a colon-number), so parseHistory's `"qNN_name":<num>`
        // key match cannot fire on it — pinned in HarnessSpec.
        s""""seg_ref":${segStamps.map { case (at, after, mem, cores) =>
          s"""{"at":$at,"after":"$after","mem":${BenchUtil.fmt(mem, 3)},""" +
            s""""cores":${BenchUtil.fmt(cores, 1)}}"""
        }.mkString("[", ",", "]")},""" +
        // "stall_ref": per-quarter steal-cores + PSI stalled fractions
        // (spans end at the matching seg_ref point; the last span covers
        // seg3→suite-end including retries). Tags and keys carry no
        // `"qNN_name":<number>` shape — parseHistory totality pinned in
        // HarnessSpec. Observational this round: no verdict gating until
        // clean bands exist for steal/PSI (docs/CALIBRATION.md protocol).
        s""""stall_ref":${stallSegs.map { case (tag, (st, pc, pm, pi)) =>
          s"""{"span":"$tag","steal_cores":${BenchUtil.fmt(st, 3)},""" +
            s""""psi_cpu":${BenchUtil.fmt(pc, 4)},""" +
            s""""psi_mem":${BenchUtil.fmt(pm, 4)},""" +
            s""""psi_io":${BenchUtil.fmt(pi, 4)}}"""
        }.mkString("[", ",", "]")},""" +
        s""""capture_profile":"$profile","capture_class":"$captureCls",""" +
        s""""capture_flags":$flagsJson,""" +
        s""""loadavg_start":"$load0",""" +
        s""""loadavg_end":"${BenchUtil.loadavg()}",""" +
        s""""load_gate":"$loadGate","load_gate_max":$loadMax""")
    try Files.writeString(Paths.get(outPath), full + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath: $e") }
    // clean-capture record (r16 ADVICE): BENCH_LOCAL keeps strict last-run
    // semantics, but a capture whose host evidence is fully clean ALSO
    // overwrites BENCH_CLEAN.<sf>.json — the representative-performance
    // record a degraded window can never clobber. Filtered or
    // partly-failed runs never qualify (their totals aren't suite totals).
    if (profile == "clean" && failed.isEmpty && nameFilters.isEmpty) {
      val cleanPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_CLEAN_OUT",
        s"/root/repo/BENCH_CLEAN.$sfTag.json")
      try Files.writeString(Paths.get(cleanPath), full + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[bench] write $cleanPath: $e") }
    }
    println(full)
    // compact twin LAST: qNN keys, 3-decimal values — must fit the 2000-char
    // stdout tail the driver parses (full names live in the file/line above).
    // The capture verdict rides along (29 chars against ~65 of measured
    // headroom at 139 queries) so a round artifact built from the tail
    // carries clean/degraded without opening BENCH_LOCAL.json; the flags
    // stay full-artifact-only.
    val shortKeys = ok.map { case (k, v) => k.takeWhile(_ != '_') -> v }
    val short =
      if (shortKeys.map(_._1).distinct.size == shortKeys.size) shortKeys
      else ok // prefix collision: fall back to full names rather than lose queries
    println(jsonLine(short.map { case (k, v) => k -> f3(v) },
      s""","capture_profile":"$profile","full":"$outPath""""))
    spark.stop()
  }
}
