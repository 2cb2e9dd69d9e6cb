package graft.tools

import graft.BenchUtil

/** Dedicated idle-host calibration for the three fixed-work host
  * references ([[BenchUtil.cpuRefSpin]], [[BenchUtil.memRefWalk]],
  * [[BenchUtil.parRefSpin]]).
  *
  * Why a separate tool (r16 ADVICE): the clean bands the bench verdict
  * gates on were previously inferred from in-suite start/end stamps —
  * i.e. from the very captures being adjudicated, so a band widened
  * whenever samples disagreed would slowly lose its gating power. This
  * main produces the bands from first principles instead: a Spark-less
  * JVM (the references are pure JVM work — no session, no executor
  * threads), an explicit idleness check before any timing, and N
  * interleaved rounds of the triad (cpu, mem, par per round, so a short
  * co-tenant burst smears across all three series instead of poisoning
  * one ref's whole run).
  *
  * Protocol per run: stamp /proc/loadavg, watch external busy cores over
  * a 2 s idle window ([[BenchUtil.extCores]] — the sbt/launcher parent is
  * out-of-process and counts, hence the 0.3-core allowance), then time N
  * triad rounds with a SECOND ext-cores reading spanning the whole timed
  * section. The output is ONE JSON line: per-reference wall
  * `[min, median, max]` (plus delivered-cores for par_ref) and the
  * idleness evidence, with `"host":"idle"` only when 1-min loadavg ≤ 0.5
  * AND the pre-watch showed ≤ 0.3 external cores AND the whole-run
  * reading stayed ≤ 0.5 (first measured idle-gated run: launch clean,
  * co-tenant burst arriving MID-RUN stretched the mem_ref median to
  * 0.150 while the min held 0.072 — the launch gate alone cannot certify
  * the span). A `"host":"busy"` run's MEDIANS are ambient-pressure
  * datapoints, not calibration; its MINIMA remain usable (contamination
  * only ever slows a fixed-work reference, and with 12 rounds against
  * sub-minute pressure oscillation some rounds land in the gaps), which
  * is how docs/CALIBRATION.md derives the clean floors.
  *
  * Usage: plain `java -cp` with `target/scala-2.13/classes` plus every
  * jar under /opt/spark/jars (a glob classpath element), main class
  * `graft.tools.RefCalibrate`, optional arg = rounds (default 10) — no
  * sbt wrapper, so the launcher JVM is the only sibling process. Results
  * are recorded in docs/CALIBRATION.md and cited by the verify skill's
  * band table.
  */
object RefCalibrate {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_CALIB_RUNS")).map(_.toInt).getOrElse(10)
    val load0 = BenchUtil.loadavg()
    val s0 = BenchUtil.cpuSnap()
    Thread.sleep(2000)
    val idleExt = BenchUtil.extCores(s0, BenchUtil.cpuSnap(), 2.0)
    val load1m = load0.split("\\s+").headOption
      .flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(-1.0)
    val gateOk = load1m >= 0 && load1m <= 0.5 && idleExt >= 0 && idleExt <= 0.3
    val threads = Runtime.getRuntime.availableProcessors
    val runSnap0 = BenchUtil.cpuSnap()
    val stall0 = BenchUtil.stallSnap()
    val runT0 = System.nanoTime
    val rows = (1 to rounds).map { _ =>
      (BenchUtil.cpuRefSpin(), BenchUtil.memRefWalk(), BenchUtil.parRefSpin())
    }
    val runElapsed = (System.nanoTime - runT0) / 1e9
    val runExt = BenchUtil.extCores(runSnap0, BenchUtil.cpuSnap(), runElapsed)
    // whole-run stall deltas (steal cores + PSI stalled fractions — see
    // BenchUtil.stallSnap): probes logged over a day ARE the ambient
    // dataset the stall_ref observational bands get frozen from
    val (stSteal, stCpu, stMem, stIo) =
      BenchUtil.stallDeltas(stall0, BenchUtil.stallSnap(), runElapsed)
    val host = if (gateOk && runExt >= 0 && runExt <= 0.5) "idle" else "busy"
    def mmm(xs: Seq[Double]): String = {
      val s = xs.sorted
      "[" + Seq(s.head, BenchUtil.median(s), s.last)
        .map(BenchUtil.fmt(_, 3)).mkString(",") + "]"
    }
    val cpuW = rows.map(_._1._1)
    val memW = rows.map(_._2._1)
    val parW = rows.map(_._3._1)
    val delivered = rows.map(r =>
      if (r._3._2 < 0 || r._3._1 <= 0) -1.0 else r._3._2 / r._3._1)
    println(
      s"""{"tool":"ref_calibrate","rounds":$rounds,"host":"$host",""" +
        s""""loadavg_start":"$load0","idle_ext_cores":${BenchUtil.fmt(idleExt, 2)},""" +
        s""""run_ext_cores":${BenchUtil.fmt(runExt, 2)},""" +
        s""""steal_cores":${BenchUtil.fmt(stSteal, 3)},""" +
        s""""psi_cpu":${BenchUtil.fmt(stCpu, 4)},""" +
        s""""psi_mem":${BenchUtil.fmt(stMem, 4)},""" +
        s""""psi_io":${BenchUtil.fmt(stIo, 4)},""" +
        s""""cpu_ref_wall":${mmm(cpuW)},"mem_ref_wall":${mmm(memW)},""" +
        s""""par_ref_wall":${mmm(parW)},"par_ref_delivered":${mmm(delivered)},""" +
        s""""threads":$threads,"loadavg_end":"${BenchUtil.loadavg()}"}""")
  }
}
