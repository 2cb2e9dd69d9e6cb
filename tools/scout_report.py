#!/usr/bin/env python3
"""Summarize a window_scout.sh probe log.

The scout (tools/window_scout.sh) probes the host-reference triad every
~150 s and launches full bench captures into clean-probing windows —
the instrument for the registered fast-window observation (BASELINE.md
"fast-window frequency prediction"). This report turns its probe log
into the three numbers that observation needs:

  1. the cpu_ref distribution across every probe (the prediction says
     elevated-frequency windows read ≈0.48 s; if hundreds of probes
     over a day never leave the 0.57-0.68 band while suite totals
     swing 94-115 s, frequency is not what moves today's totals);
  2. the clean-window rate and its persistence P(clean @ t+dt | clean
     @ t) between consecutive probes — with the probe interval this
     bounds the chance any 100 s suite launched into a clean probe
     stays clean for its whole span (the first scouted capture: probe
     fully clean at 31 delivered cores, suite degraded by seg2);
  3. per-capture outcomes (total + verdict) pulled from the launch
     lines, so probe context and capture verdicts sit in one table.

Usage: python3 tools/scout_report.py [/tmp/scout.log]
"""
import json
import re
import sys


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scout.log"
    probes = []          # (ts, cpu_min, mem_min, par_max, verdict)
    stalls = []          # (steal_cores, psi_cpu, psi_mem, psi_io)
    captures = []        # (ts, total, profile)
    pending_launch = None
    for line in open(path):
        line = line.strip()
        m = re.match(r"^(\S+) (\{.*\})$", line)
        if m and '"ref_calibrate"' in line:
            d = json.loads(m.group(2))
            probes.append((m.group(1), d["cpu_ref_wall"][0],
                           d["mem_ref_wall"][0], d["par_ref_delivered"][2],
                           None))
            if "steal_cores" in d:
                stalls.append((d["steal_cores"], d["psi_cpu"],
                               d["psi_mem"], d["psi_io"],
                               d.get("run_ext_cores", -1.0)))
            continue
        m = re.match(r"^(\S+) verdict=(\w+)", line)
        if m and probes:
            ts, c, me, p, _ = probes[-1]
            probes[-1] = (ts, c, me, p, m.group(2))
            continue
        m = re.match(r"^(\S+) launching capture", line)
        if m:
            pending_launch = m.group(1)
            continue
        if line.startswith('{"metric"') and '"full"' in line:
            d = json.loads(line)
            captures.append((pending_launch or "?", d["value"],
                             d.get("capture_profile", "?")))
            pending_launch = None

    if not probes:
        print("no probes in", path)
        return
    cpus = sorted(p[1] for p in probes)
    n = len(cpus)
    print(f"probes: {n}")
    print(f"cpu_ref min-wall: min {cpus[0]:.3f}  p10 {cpus[n//10]:.3f}  "
          f"median {cpus[n//2]:.3f}  p90 {cpus[9*n//10]:.3f}  max {cpus[-1]:.3f}")
    fast = [c for c in cpus if c <= 0.52]
    print(f"fast-signature probes (cpu_ref <= 0.52): {len(fast)}")
    verdicts = [p[4] for p in probes if p[4] in ("clean", "fast", "busy")]
    nclean = sum(1 for v in verdicts if v in ("clean", "fast"))
    print(f"clean-window rate: {nclean}/{len(verdicts)}"
          f" = {nclean / max(1, len(verdicts)):.2f}")
    # persistence over consecutive probe pairs (captures between two
    # probes stretch the gap well past the interval — skip those pairs)
    pairs = stay = 0
    cap_ts = {c[0] for c in captures}
    for a, b in zip(probes, probes[1:]):
        if a[4] in ("clean", "fast") and a[0] not in cap_ts:
            pairs += 1
            stay += b[4] in ("clean", "fast")
    if pairs:
        print(f"clean persistence over one probe interval: {stay}/{pairs}"
              f" = {stay / pairs:.2f}")
    if stalls:
        # ambient stall dataset (probes carrying steal/PSI): the raw
        # material for freezing stall_ref observational bands
        sv = sorted(s[0] for s in stalls)
        k = len(sv)
        print(f"ambient steal_cores over {k} probes: min {sv[0]:.3f}  "
              f"median {sv[k//2]:.3f}  p90 {sv[9*k//10]:.3f}  max {sv[-1]:.3f}")
        print(f"probes with steal >= 0.5 cores: "
              f"{sum(1 for s in sv if s >= 0.5)}/{k}")
        # quiet-guest split: probes whose own whole-run ext reading was
        # ≤0.5 cores (RefCalibrate's idle-verdict bound) isolate the
        # steal floor from in-guest-load windows — the number the
        # StealConfirmMinCores freeze cites (steal ticks only for
        # co-tenant work, so the split should barely move the maxima
        # but pins the floor on a provably quiet guest)
        quiet = sorted(s[0] for s in stalls if 0 <= s[4] <= 0.5)
        if quiet:
            q = len(quiet)
            print(f"quiet-guest (run_ext <= 0.5) steal over {q} probes: "
                  f"min {quiet[0]:.3f}  median {quiet[q//2]:.3f}  "
                  f"max {quiet[-1]:.3f}")
        for i, name in ((1, "psi_cpu"), (2, "psi_mem"), (3, "psi_io")):
            mx = max(s[i] for s in stalls)
            print(f"max {name}: {mx:.4f}")
    print(f"captures launched: {len(captures)}")
    for ts, total, prof in captures:
        print(f"  {ts}  {total:.1f} s  {prof}")


if __name__ == "__main__":
    main()
