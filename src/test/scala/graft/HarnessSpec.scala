package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.types._

/** Unit pins for the harness defenses themselves — the bench
  * contention-retry history parser and Verify's decimal-dump gate. Both
  * guard the driver gates silently (a regression would just disable the
  * defense, never fail a query), so they get direct coverage here.
  */
class HarnessSpec extends AnyFunSuite {

  test("bench name filter: empty segments dropped, unset means match-all") {
    // "q106," must NOT degrade to match-all: a "" alternative makes
    // name.contains vacuously true for every query (round-12 advice)
    assert(BenchUtil.parseNameFilters("q106,") == Seq("q106"))
    assert(BenchUtil.parseNameFilters("q106,,q85") == Seq("q106", "q85"))
    assert(BenchUtil.parseNameFilters("") == Nil)
    assert(BenchUtil.parseNameFilters(" , ") == Nil)
    assert(BenchUtil.matchesFilter("q85_percentiles", Nil),
      "unset filter must match every query (the driver's unfiltered run)")
    assert(BenchUtil.matchesFilter("q106_ann", Seq("q106")))
    assert(!BenchUtil.matchesFilter("q85_percentiles", Seq("q106")))
  }

  test("Bench.parseHistory reads its own file format and ignores non-query fields") {
    val line =
      """{"sf":"/root/testdata/sf0.1","q01_traffic_rollup":1.064715684,""" +
        """"q148_streamed_attribution":4.6e0,"q99_click_attribution":0.52}"""
    val h = Bench.parseHistory(line)
    assert(h == Map(
      "q01_traffic_rollup" -> 1.064715684,
      "q148_streamed_attribution" -> 4.6,
      "q99_click_attribution" -> 0.52))
  }

  test("Bench.parseHistory survives a full BENCH_LOCAL line (arrays, loadavg, compact keys)") {
    val line =
      """{"metric":"total","value":99.971,"unit":"sec","queries":{"q02_traffic_total":0.36},""" +
        """"sf":"/root/testdata/sf0.1","runs":3,"failed":["q999_zzz_broken"],""" +
        """"retried":["q01_traffic_rollup"],""" +
        """"ext_cores":{"q02_traffic_total":[1.73,0.64],"q03_decimal_agg":[0.00,0.00]},""" +
        """"ext_cores_retry":{"q02_traffic_total":[2.10,1.05]},""" +
        """"cpu_ref":{"start":[0.412,0.409],"end":[0.318,0.317]},""" +
        """"mem_ref":{"start":[0.101,0.100],"end":[0.099,0.099]},""" +
        """"par_ref":{"start":[0.320,9.910],"end":[0.310,9.850],"threads":32},""" +
        """"loadavg_start":"2.56 3.08 2.53"}"""
    val h = Bench.parseHistory(line)
    // numeric pairs only: the failed/retried ARRAY members carry no value
    // and must not parse; "value"/"runs" lack the qNN_ prefix; the
    // ext_cores / ext_cores_retry stamps use FULL query names and must be
    // excised — else a BENCH_LOCAL line fed as history would read 1.73 (a
    // contamination stamp) as q02's all-time-best median
    assert(h == Map("q02_traffic_total" -> 0.36))
    // the pre-r15 scalar stamp form must stay excised too (old BENCH_LOCAL
    // artifacts remain valid parseHistory input)
    val legacy = line.replace("[1.73,0.64]", "1.73").replace("[0.00,0.00]", "0.00")
    assert(Bench.parseHistory(legacy) == Map("q02_traffic_total" -> 0.36))
  }

  test("cpuRefSpin: deterministic work, sane wall/cpu split") {
    // small iteration count — this pins the CONTRACT (fixed work, fixed
    // checksum, single-thread cpu ≤ wall), not the host's speed
    val iters = 1L << 22
    val r1 = BenchUtil.cpuRefSpin(iters)
    val r2 = BenchUtil.cpuRefSpin(iters)
    assert(r1._3 == r2._3, "fixed seed + fixed iters must give a fixed checksum")
    // thread cpu time: either unsupported (-1) or positive and bounded by
    // wall (single thread; +20ms slack for timer granularity)
    for ((w, c, _) <- Seq(r1, r2)) {
      assert(w > 0.0)
      if (c != -1.0) {
        assert(c > 0.0)
        assert(c <= w + 0.02,
          s"single-thread cpu time $c cannot exceed its wall time $w")
      }
    }
    // default-iteration stamp field is the committed artifact contract
    assert(BenchUtil.CpuRefIters == (1L << 28))
  }

  test("memRefWalk: deterministic work, sane wall/cpu split") {
    // small working set + passes: pins the contract, not the host's speed
    val r1 = BenchUtil.memRefWalk(1L << 20, 2)
    val r2 = BenchUtil.memRefWalk(1L << 20, 2)
    assert(r1._3 == r2._3, "fixed fill + fixed passes must give a fixed checksum")
    for ((w, c, _) <- Seq(r1, r2)) {
      assert(w > 0.0)
      if (c != -1.0) { assert(c > 0.0); assert(c <= w + 0.02) }
    }
    // artifact-comparability constants (64 MiB working set, 16 passes)
    assert(BenchUtil.MemRefBytes == (64L << 20))
    assert(BenchUtil.MemRefPasses == 16)
  }

  test("parRefSpin: deterministic work, cpu sum bounded by threads x wall") {
    val r1 = BenchUtil.parRefSpin(threads = 2, iters = 1L << 21)
    val r2 = BenchUtil.parRefSpin(threads = 2, iters = 1L << 21)
    assert(r1._3 == r2._3,
      "fixed seed + fixed iters + fixed thread count must give a fixed checksum")
    for ((w, c, _) <- Seq(r1, r2)) {
      assert(w > 0.0)
      if (c != -1.0) {
        assert(c > 0.0)
        // 2 threads: aggregate cpu cannot exceed 2x wall (+timer slack)
        assert(c <= 2 * w + 0.04,
          s"aggregate cpu $c cannot exceed threads x wall (2 x $w)")
      }
    }
  }

  test("Bench.parseHistory of garbage or empty input is empty, not an exception") {
    assert(Bench.parseHistory("").isEmpty)
    assert(Bench.parseHistory("not json at all").isEmpty)
    // a compact short-key line ("q01":1.1) has no _name suffix — ignored,
    // so the driver's 2000-char stdout tail can never poison the history
    assert(Bench.parseHistory("""{"q01":1.065,"q02":0.320}""").isEmpty)
  }

  test("Bench.historyLine emits valid JSON for empty and nonempty merges") {
    // all-queries-failed + no prior history previously wrote {"sf":"…",}
    // — a trailing comma any standard JSON consumer of the committed
    // history file chokes on
    val empty = Bench.historyLine("/root/testdata/sf0.1", Nil)
    assert(empty == "{\"sf\":\"/root/testdata/sf0.1\"}\n")
    val two = Bench.historyLine("/sf", Seq("q01_a" -> 1.5, "q02_b" -> 0.25))
    assert(two == "{\"sf\":\"/sf\",\"q01_a\":1.5,\"q02_b\":0.25}\n")
    // round-trips through the reader that consumes it
    assert(Bench.parseHistory(two) == Map("q01_a" -> 1.5, "q02_b" -> 0.25))
    assert(Bench.parseHistory(empty).isEmpty)
  }

  test("Bench.mergeHistory: element-wise min, filtered-run keep, rename prune") {
    val history = Map("q01_a" -> 1.0, "q02_b" -> 2.0, "q99_renamed" -> 9.0)
    val run = Map("q01_a" -> 0.8, "q03_c" -> 3.0) // q02_b absent: filtered run
    val live = Set("q01_a", "q02_b", "q03_c")     // q99_renamed no longer registered
    assert(Bench.mergeHistory(history, run, live) ==
      Seq("q01_a" -> 0.8, "q02_b" -> 2.0, "q03_c" -> 3.0))
    // a regressed sample never ratchets the history upward
    assert(Bench.mergeHistory(Map("q01_a" -> 1.0), Map("q01_a" -> 5.0),
      Set("q01_a")) == Seq("q01_a" -> 1.0))
  }

  test("Bench.retrySet: history trigger, ext-stamp trigger, floor guard, failed-always, cap") {
    val history = Map("q01_a" -> 1.0, "q02_b" -> 0.3, "q03_c" -> 0.2, "q04_d" -> 1.0)
    val medians = Seq("q01_a" -> 2.5, "q02_b" -> 0.45, "q03_c" -> 0.25,
      "q04_d" -> 0.9, "q05_e" -> -1.0)
    // q01: 2.5 > 2×1.0 and > 0.5 s → history trigger (excess 1.5).
    // q02: under the 2× trigger's 0.5 s noise floor, but an intruder stamp
    //   of 1.2 cores + median above its 0.3 floor → ext trigger (the
    //   round-14 q123–q125 burst fired ZERO history retries).
    // q03: stamped hot but AT/below any damage threshold? median 0.25 >
    //   floor 0.2 → also retried; q04: stamped hot but median 0.9 ≤ floor
    //   1.0 → NOT retried (nothing to recover). q05: failed → always.
    val ext = Map("q02_b" -> 1.2, "q03_c" -> 3.0, "q04_d" -> 2.0)
    val r = Bench.retrySet(medians, history, ext)
    assert(r.map(_._1) == Seq("q01_a", "q02_b", "q03_c", "q05_e"),
      s"worst-excess order, ext hits included, floor-safe q04 excluded: $r")
    // no stamps, no regressions → only failures retry
    assert(Bench.retrySet(medians, Map.empty ++ history.view.mapValues(_ * 10),
      Map.empty).map(_._1) == Seq("q05_e"))
    // cap: 13 history-hot queries keep only the 12 worst by excess
    val many = (1 to 13).map(i => (f"q$i%02d_x", 10.0 + i))
    val manyHist = many.map { case (n, _) => n -> 1.0 }.toMap
    val capped = Bench.retrySet(many, manyHist, Map.empty)
    assert(capped.size == 12 && !capped.map(_._1).contains("q01_x"),
      "cap keeps the 12 worst by absolute excess")
    // history-less ext hit: still retried (nothing proves the median clean)
    // but ranked at excess 0, NOT its raw median — on a history-less first
    // capture under load, a long stamped query must not crowd genuine
    // history regressions out of the shared 12-cap
    val r2 = Bench.retrySet(
      Seq("q01_new" -> 50.0, "q02_b" -> 0.45),
      Map("q02_b" -> 0.3),
      Map("q01_new" -> 2.0, "q02_b" -> 1.2))
    assert(r2.map(t => (t._1, t._3)) == Seq("q02_b" -> (0.45 - 0.3), "q01_new" -> 0.0),
      s"history-less stamped query ranks last at excess 0: $r2")
    // and under cap pressure the history-less hit is the one dropped
    val manyExt = many.map { case (n, _) => n -> 1.5 }.toMap + ("q99_new" -> 5.0)
    val pressed = Bench.retrySet(many :+ ("q99_new" -> 100.0), manyHist, manyExt)
    assert(pressed.size == 12 && !pressed.map(_._1).contains("q99_new"),
      s"history-less ext hit must not displace real regressions: $pressed")
  }

  test("round2/roundAt: gates consume the exact value the stamps print") {
    // r17 ADVICE: extPairJson stamps 2 decimals while the gates compared
    // unrounded maxima, so boundary readings contradicted the documented
    // stamp-re-derivability. The gates now consume round2/roundAt values,
    // which must agree with BenchUtil.fmt (String.format HALF_UP) at the
    // same precision — over the NON-NEGATIVE domain the stamps live in
    // (clamped-at-0 core readings and wall seconds; the -1 unreadable
    // sentinels are never rounded or gated, and a negative near-zero
    // would differ only in "-0.0" vs "0.0" signed-zero rendering).
    for (v <- Seq(0.495, 0.4949, 0.4999, 0.995, 0.9949, 1.005, 0.005,
      0.0045, 0.0054, 31.04, 31.05, 30.94, 0.0, 2.515)) {
      assert(BenchUtil.fmt(BenchUtil.round2(v), 2) == BenchUtil.fmt(v, 2),
        s"round2($v) must render as the 2-decimal stamp renders $v")
      assert(BenchUtil.fmt(BenchUtil.roundAt(v, 3), 3) == BenchUtil.fmt(v, 3))
      assert(BenchUtil.fmt(BenchUtil.roundAt(v, 1), 1) == BenchUtil.fmt(v, 1))
    }
    assert(BenchUtil.round2(0.495) == 0.50) // stamps 0.50 ⇒ must confirm
    assert(BenchUtil.round2(0.995) == 1.00) // stamps 1.00 ⇒ must trigger
    assert(BenchUtil.round2(0.9949) == 0.99)
    assert(BenchUtil.roundAt(0.0054, 3) == 0.005) // stall stamp precision
    assert(BenchUtil.roundAt(31.04, 1) == 31.0)   // seg cores precision
  }

  test("Bench.retryExtStamps: steal-confirmed intruders only, conservative when unreadable") {
    // the band-freeze constant is the committed retry contract: idle-host
    // steal reads ≤0.01 cores, measured co-tenant bursts 0.73–5.83, so
    // 0.5 separates them by an order of magnitude each way
    // (docs/CALIBRATION.md, two dedicated distributions)
    assert(BenchUtil.StealConfirmMinCores == 0.5)
    assert(BenchUtil.stealConfirms(None), "unreadable steal confirms (pre-steal behavior)")
    assert(!BenchUtil.stealConfirms(Some(0.49)))
    assert(BenchUtil.stealConfirms(Some(0.5)))
    val ext = Map(
      "q01_a" -> List(1.41, 0.10),  // co-tenant burst (steal ≈ ext)
      "q02_b" -> List(1.08, 0.20),  // in-guest work (steal ≈ 0)
      "q03_c" -> List(2.00),        // steal samples missing entirely
      "q04_d" -> List(0.90, 1.10),  // steal burst on the OTHER sample:
      "q05_e" -> List.empty[Double]) //   query-level max still confirms
    val steal = Map(
      "q01_a" -> List(1.65, 0.02),
      "q02_b" -> List(0.03, 0.01),
      "q04_d" -> List(0.85, 0.04),
      "q05_e" -> List(3.0))
    val stamps = Bench.retryExtStamps(ext, steal)
    assert(stamps == Map("q01_a" -> 1.41, "q03_c" -> 2.0, "q04_d" -> 1.1),
      s"q02 dropped (in-guest), q03 kept (unreadable), q05 dropped (no ext samples): $stamps")
    // boundary readings gate on the ROUNDED (= stamped) value: ext 0.995
    // stamps 1.00 and is eligible at ≥1.0 downstream; steal 0.495 stamps
    // 0.50 and confirms; steal 0.4949 stamps 0.49 and does not
    val b = Bench.retryExtStamps(
      Map("q01_a" -> List(0.995), "q02_b" -> List(0.995)),
      Map("q01_a" -> List(0.495), "q02_b" -> List(0.4949)))
    assert(b == Map("q01_a" -> 1.0),
      s"stamped-value gating at both boundaries: $b")
    // PARTIAL steal list (fewer samples than ext — the steal read failed
    // on some sample, possibly the contaminated one): conservative
    // confirm, same as unreadable (r17 ADVICE)
    val p = Bench.retryExtStamps(
      Map("q01_a" -> List(1.41, 1.2, 0.1)),
      Map("q01_a" -> List(0.03, 0.01))) // 2 steal samples vs 3 ext
    assert(p == Map("q01_a" -> 1.41),
      s"partial steal evidence must confirm conservatively: $p")
    // composition with retrySet: the measured wasted-retry case (q93-shaped
    // in-guest stamp above floor) no longer fires; the co-tenant case does
    val medians = Seq("q01_a" -> 0.45, "q02_b" -> 0.45)
    val history = Map("q01_a" -> 0.3, "q02_b" -> 0.3)
    assert(Bench.retrySet(medians, history,
      Bench.retryExtStamps(
        Map("q01_a" -> List(1.41), "q02_b" -> List(1.08)),
        Map("q01_a" -> List(1.65), "q02_b" -> List(0.03)))).map(_._1)
      == Seq("q01_a"))
  }

  test("BenchUtil.captureProfile: clean iff no band/intruder/gate evidence fires") {
    // band constants are the committed artifact contract (this host's
    // measured envelopes — see the scaladoc's calibration sources)
    assert(BenchUtil.CpuRefCleanWallMax == 0.70)
    assert(BenchUtil.MemRefCleanWallMax == 0.12)
    assert(BenchUtil.ParRefCleanFracMin == 0.80)
    val cleanCpu = Seq("start" -> 0.60, "end" -> 0.63)
    val cleanMem = Seq("start" -> 0.08, "end" -> 0.11)
    val cleanPar = Seq("start" -> 29.4, "end" -> 28.1)
    // fully clean capture: verdict "clean", zero flags
    assert(BenchUtil.captureProfile(cleanCpu, cleanMem, cleanPar, 32,
      Nil, "clean") == ("clean", Nil))
    // the r16 degraded capture's shape: mem_ref START stretched (0.164) +
    // intruder stamps on two queries — exactly the evidence the prose
    // adjudication used, now machine-readable
    val (v, flags) = BenchUtil.captureProfile(cleanCpu,
      Seq("start" -> 0.164, "end" -> 0.08), cleanPar, 32,
      Seq("q49_point_lookup_miss", "q125_kmeans_train"), "clean")
    assert(v == "degraded" && flags.size == 2)
    assert(flags.head == "mem_ref start 0.164 above 0.12")
    assert(flags(1) == "ext_cores max ge 1.0 on q49_point_lookup_miss q125_kmeans_train")
    // the measured aggregate-starvation window (18.5 of 32 delivered)
    val (v2, f2) = BenchUtil.captureProfile(cleanCpu, cleanMem,
      Seq("start" -> 18.5, "end" -> 30.7), 32, Nil, "clean")
    assert(v2 == "degraded" &&
      f2 == Seq("par_ref start delivered 18.5 of 32 cores under 25.6"))
    // unknown delivered cores (thread-cpu unsupported ⇒ -1) is SKIPPED,
    // never read as degraded; a contended load gate alone degrades
    assert(BenchUtil.captureProfile(cleanCpu, cleanMem,
      Seq("start" -> -1.0, "end" -> -1.0), 32, Nil, "clean")._1 == "clean")
    assert(BenchUtil.captureProfile(cleanCpu, cleanMem, cleanPar, 32,
      Nil, "contended") == ("degraded", Seq("load gate contended")))
    // cpu_ref stretch fires its own flag
    assert(BenchUtil.captureProfile(Seq("start" -> 0.60, "end" -> 0.93),
      cleanMem, cleanPar, 32, Nil, "clean")._2
      == Seq("cpu_ref end 0.930 above 0.70"))
    // mid-suite segment entries ride the same band checks under their own
    // tags — a clean-ends capture with a degraded middle must degrade
    val (v3, f3) = BenchUtil.captureProfile(cleanCpu,
      Seq("start" -> 0.08, "seg1" -> 0.09, "seg2" -> 0.196, "end" -> 0.07),
      Seq("start" -> 29.4, "seg1" -> 28.0, "seg2" -> 21.3, "end" -> 30.1),
      32, Nil, "clean")
    assert(v3 == "degraded" && f3 == Seq(
      "mem_ref seg2 0.196 above 0.12",
      "par_ref seg2 delivered 21.3 of 32 cores under 25.6"))
    // parseHistory totality over an artifact carrying the new fields:
    // flags and seg_ref hold query names only as VALUES (or inside flag
    // prose) — never the `"qNN_name":<number>` key shape
    val line = """{"q02_traffic_total":0.36,""" +
      """"seg_ref":[{"at":104,"after":"q45_widecol_prefix_scan",""" +
      """"mem":0.081,"cores":29.3}],""" +
      """"stall_ref":[{"span":"seg1","steal_cores":0.031,""" +
      """"psi_cpu":0.0012,"psi_mem":0.0000,"psi_io":0.0404}],""" +
      """"ext_cores_steal":{"q45_widecol_prefix_scan":[0.73,0.12]},""" +
      """"capture_profile":"degraded",""" +
      """"capture_flags":["mem_ref start 0.164 above 0.12",""" +
      """"ext_cores max ge 1.0 on q49_point_lookup_miss q125_kmeans_train"],""" +
      """"load_gate":"clean"}"""
    assert(Bench.parseHistory(line) == Map("q02_traffic_total" -> 0.36),
      "capture stamps must not poison a BENCH_LOCAL line fed as history")
  }

  test("BenchUtil.captureClass: pristine only on joint quarter evidence, ambient otherwise") {
    // the frozen sub-verdict constants (docs/CALIBRATION.md "pristine
    // sub-verdict": RefCalibrate-protocol probe distributions, 171+
    // probes over three days — NOT the two anchor captures alone)
    assert(BenchUtil.PristineStealMaxCores == 0.005)
    assert(BenchUtil.PristineParFracMin == 0.97)
    assert(BenchUtil.PristineMemRefWallMax == 0.08)
    // the 74.63 s zero-co-tenancy recurrence (r17 session 3): mem stamps
    // 0.053–0.070, seg cores 31.1–31.5, quarter-steal 0.002–0.003
    val pristine = BenchUtil.captureClass(
      Seq(0.065, 0.070, 0.058, 0.053, 0.054),
      Seq(31.5, 31.1, 31.4), 32,
      Seq(0.003, 0.002, 0.002, 0.002))
    assert(pristine == "pristine")
    // the 86.96 s ambient-clean record: seg cores 29.3–30.9 and
    // quarter-steal 0.008–0.027 both sit outside the pristine bands
    assert(BenchUtil.captureClass(
      Seq(0.069, 0.077, 0.069, 0.061, 0.065),
      Seq(30.1, 29.3, 30.9), 32,
      Seq(0.025, 0.027, 0.008, 0.008)) == "ambient")
    // steal-silent bandwidth-pressure window (probe: mem 0.17 at steal
    // 0.004, full cores) — the mem bound excludes it from pristine
    assert(BenchUtil.captureClass(
      Seq(0.170, 0.075, 0.070), Seq(31.2, 31.3), 32,
      Seq(0.004, 0.004)) == "ambient")
    // single axis misses flip to ambient: one seg at 30.9 cores; one
    // quarter-steal at 0.006. BOTH sides of the cores gate live on the
    // 1-decimal stamp grid (r18 ADVICE): threshold roundAt(0.97*32,1)
    // = 31.0, so 31.04 stamps 31.0 and passes, 30.94 stamps 30.9 and
    // fails — grid-vs-grid, re-derivable from the artifact's "cores"
    // stamp at any thread count, no binary-float hinge
    assert(BenchUtil.captureClass(Seq(0.06), Seq(31.5, 30.9), 32,
      Seq(0.002)) == "ambient")
    assert(BenchUtil.captureClass(Seq(0.06), Seq(31.5), 32,
      Seq(0.002, 0.006)) == "ambient")
    assert(BenchUtil.captureClass(Seq(0.06), Seq(31.05), 32,
      Seq(0.002)) == "pristine")
    assert(BenchUtil.captureClass(Seq(0.06), Seq(31.04), 32,
      Seq(0.002)) == "pristine")
    assert(BenchUtil.captureClass(Seq(0.06), Seq(30.94), 32,
      Seq(0.002)) == "ambient")
    // non-32-thread boundary: 0.97*30 = 29.099999… in binary — the
    // rounded threshold 29.1 makes a 29.1 stamp pass deterministically
    assert(BenchUtil.captureClass(Seq(0.06), Seq(29.1), 30,
      Seq(0.002)) == "pristine")
    assert(BenchUtil.captureClass(Seq(0.06), Seq(29.04), 30,
      Seq(0.002)) == "ambient")
    // steal gates at the 3-decimal stamp value (0.0054 stamps 0.005)
    assert(BenchUtil.captureClass(Seq(0.06), Seq(31.5), 32,
      Seq(0.0054)) == "pristine")
    // pristine needs POSITIVE evidence on all three axes: missing seg
    // stamps, missing quarters, or unreadable (-1) readings never
    // classify pristine
    assert(BenchUtil.captureClass(Seq(0.06), Nil, 32, Seq(0.002)) == "ambient")
    assert(BenchUtil.captureClass(Seq(0.06), Seq(31.5), 32, Nil) == "ambient")
    assert(BenchUtil.captureClass(Seq(0.06), Seq(31.5), 32,
      Seq(-1.0)) == "ambient")
    assert(BenchUtil.captureClass(Seq(-1.0), Seq(31.5), 32,
      Seq(0.002)) == "ambient")
    // parseHistory totality over an artifact carrying the class stamp
    assert(Bench.parseHistory(
      """{"q02_traffic_total":0.36,"capture_profile":"clean",""" +
        """"capture_class":"pristine"}""")
      == Map("q02_traffic_total" -> 0.36))
  }

  test("stall counters: snapshots are monotonic and deltas normalize per second") {
    // live read: every readable counter is non-negative and never counts
    // down between consecutive snapshots (they are cumulative kernel
    // counters; a -1 means the interface is absent and must stay -1)
    val a = BenchUtil.stallSnap()
    val b = BenchUtil.stallSnap()
    for ((x, y) <- Seq(a._1 -> b._1, a._2 -> b._2, a._3 -> b._3, a._4 -> b._4)) {
      assert(x >= -1L)
      if (x >= 0) assert(y >= x, "cumulative stall counter went backwards")
      else assert(y == -1L, "an absent interface must stay absent")
    }
    // arithmetic pin: steal ticks normalize at 100/s to average cores
    // (the extCores unit), PSI totals at 1e6/s to stalled fractions
    val d = BenchUtil.stallDeltas((1000L, 0L, 500000L, 0L),
      (1200L, 2000000L, 500000L, 1000000L), 2.0)
    assert(d == ((1.0, 1.0, 0.0, 0.5)))
    // -1 endpoints poison only their own component; counter resets clamp
    // to zero like extCores; degenerate interval poisons all four
    val e = BenchUtil.stallDeltas((-1L, 100L, 50L, 7L), (10L, 90L, 60L, 7L), 1.0)
    assert(e == ((-1.0, 0.0, 0.00001, 0.0)))
    assert(BenchUtil.stallDeltas(a, b, 0.0) == ((-1.0, -1.0, -1.0, -1.0)))
  }

  test("scratchDir default is salted with the application id (concurrent-session isolation)") {
    // streaming jobs fs.delete their scratch at start — a fixed shared
    // default would let two concurrent sessions (bench + test run) delete
    // each other's watch dirs and checkpoints mid-query; an explicit conf
    // override is taken verbatim (the caller owns isolation then)
    val spark = SparkTestSession.spark
    assert(Tables.scratchDir(spark)
      == s"/tmp/graft_scratch/${spark.sparkContext.applicationId}")
    spark.conf.set("spark.graft.scratchDir", "/tmp/explicit_scratch")
    try assert(Tables.scratchDir(spark) == "/tmp/explicit_scratch")
    finally spark.conf.unset("spark.graft.scratchDir")
  }

  test("scratch sweep is liveness-gated: a live owner's tree is never swept by age") {
    // an mtime-only sweep would delete the streaming checkpoints of a
    // long-idle but still-running session; the .pid marker decides
    val base = java.nio.file.Files.createTempDirectory("graft_sweep").toFile
    def dirWith(pid: Option[String]): java.io.File = {
      val d = java.nio.file.Files.createTempDirectory(base.toPath, "app").toFile
      pid.foreach(p => java.nio.file.Files.writeString(
        new java.io.File(d, ".pid").toPath, p))
      d
    }
    val futureCutoff = System.currentTimeMillis + 3600 * 1000 // everything "old"
    val pastCutoff = System.currentTimeMillis - 3600 * 1000   // everything "fresh"
    val myPid = ProcessHandle.current().pid().toString
    assert(!Tables.scratchOwnerDead(dirWith(Some(myPid)), futureCutoff),
      "a tree whose owning pid is alive must survive any age cutoff")
    assert(Tables.scratchOwnerDead(dirWith(Some("999999999")), pastCutoff),
      "a tree whose owning pid is dead is sweepable regardless of age")
    assert(Tables.scratchOwnerDead(dirWith(None), futureCutoff),
      "a legacy tree without a marker falls back to the age cutoff (old)")
    assert(!Tables.scratchOwnerDead(dirWith(None), pastCutoff),
      "a legacy tree without a marker falls back to the age cutoff (fresh)")
    // a malformed marker falls back to the age cutoff instead of throwing
    assert(Tables.scratchOwnerDead(dirWith(Some("not a pid")), futureCutoff))
    assert(!Tables.scratchOwnerDead(dirWith(Some("not a pid")), pastCutoff))
  }

  test("deleteTree unlinks symlinks without following them") {
    // the scratch root lives in world-writable /tmp: a link planted in a
    // dead session's tree (link -> some real dir) must be removed as a
    // link, never traversed — File.isDirectory resolves links and a
    // follow-through recursion would delete the TARGET's contents
    import java.nio.file.{Files, Paths}
    val target = Files.createTempDirectory("graft_symlink_target")
    val keep = Files.writeString(target.resolve("keep.txt"), "survives")
    val doomed = Files.createTempDirectory("graft_symlink_tree")
    try {
      Files.writeString(doomed.resolve("own.txt"), "goes away")
      Files.createSymbolicLink(doomed.resolve("link"), target)
      Tables.deleteTree(doomed.toFile)
      assert(!Files.exists(doomed), "the tree itself is deleted")
      assert(Files.exists(keep), "the symlink target's contents survive")
    } finally {
      // deleteTree (not bare deletes) so a failed assertion still cleans
      // up both temp trees instead of leaking graft_symlink_* in /tmp
      Tables.deleteTree(target.toFile)
      Tables.deleteTree(doomed.toFile)
    }
  }

  test("Verify.decimalColumns flags EVERY DecimalType at any nesting depth") {
    // the invariant is any-decimal, not precision>18: round 9 proved an
    // int64-backed decimal(18,6) dump fails the driver hash on all rows
    // (pyarrow Decimal("194.280000") vs oracle float 194.28)
    assert(Verify.decimalColumns(new StructType()
      .add("a", DoubleType).add("b", LongType).add("c", StringType)).isEmpty)
    assert(Verify.decimalColumns(new StructType()
      .add("a", DecimalType(18, 6))) == Seq("a: DecimalType(18,6)"))
    assert(Verify.decimalColumns(new StructType()
      .add("a", DecimalType(19, 6))) == Seq("a: DecimalType(19,6)"))
    val nested = new StructType()
      .add("s", new StructType().add("x", DecimalType(28, 6)))
      .add("arr", ArrayType(DecimalType(20, 2)))
      .add("m", MapType(StringType, DecimalType(38, 0)))
      .add("low", DecimalType(10, 2))
      .add("d", DoubleType)
    assert(Verify.decimalColumns(nested).toSet == Set(
      "s.x: DecimalType(28,6)", "arr[]: DecimalType(20,2)",
      "m<value>: DecimalType(38,0)", "low: DecimalType(10,2)"))
  }

  test("decimal->double reporting is the identical IEEE value both engines produce") {
    // executable form of the q140/q03 fix's premise: for a decimal whose
    // backing integer is < 2^53, BigDecimal.doubleValue (Spark's cast) and
    // backing/10^scale in double arithmetic (DuckDB's int64-decimal cast)
    // are the same correctly-rounded double — so casting the final
    // projection to double on both sides hashes identically
    val cases = Seq(
      (BigDecimal("194.280000"), 194280000L, 6),
      (BigDecimal("1061400897.67"), 106140089767L, 2),
      (BigDecimal("0.000001"), 1L, 6),
      (BigDecimal("-7.100000"), -7100000L, 6),
      (BigDecimal("123456789012.345678"), 123456789012345678L, 6))
    cases.foreach { case (bd, backing, scale) =>
      val sparkSide = bd.underlying.doubleValue
      val duckSide = backing.toDouble / math.pow(10, scale)
      assert(java.lang.Double.doubleToLongBits(sparkSide)
        == java.lang.Double.doubleToLongBits(duckSide),
        s"decimal->double divergence for $bd")
    }
    // and the canonical-STRING asymmetry the gate exists to prevent: a
    // declared-scale decimal rendering never equals the float rendering
    assert(BigDecimal("194.280000").underlying.toPlainString == "194.280000")
    assert(194.28.toString == "194.28")
    assert(BigDecimal("194.280000").underlying.toPlainString != 194.28.toString)
  }
}
