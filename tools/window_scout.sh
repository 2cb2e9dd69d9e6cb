#!/bin/bash
# Window scout for the registered fast-window observation
# (docs/SCALE_MEASURED.md "discriminating observation", BASELINE.md
# "fast-window frequency prediction — still open"). The 72–77 s
# floor-setting captures all predate the triad stamps, and ambient
# pressure on this host oscillates on sub-minute timescales — a full
# 100 s suite launched blind usually lands degraded. This loop probes
# the triad cheaply (graft.tools.RefCalibrate, 2 rounds ≈ 3 s of fixed
# work in a Spark-less JVM) every PROBE_EVERY seconds and launches the
# full sf0.1 bench ONLY into a window whose probe reads clean
# (cpu_ref min ≤ 0.70, mem_ref min ≤ 0.12, delivered cores ≥ 0.8×32 —
# the same gate constants captureProfile uses, docs/CALIBRATION.md).
# A cpu_ref min ≤ CPU_FAST (0.52) is the elevated-frequency signature
# the prediction says the fast band should carry — it fires a capture
# immediately, regardless of spacing.
#
# Artifacts: probes append to $SCOUT_LOG; each launched capture writes
# BENCH_LOCAL.json as usual (and BENCH_CLEAN.sf0.1.json iff its own
# capture_profile verdict is clean). The scout never edits history.
set -u
cd /root/repo
SCOUT_LOG=${SCOUT_LOG:-/tmp/scout.log}
PROBE_EVERY=${PROBE_EVERY:-180}        # seconds between probes
BENCH_SPACING=${BENCH_SPACING:-900}    # min seconds between launched captures
MAX_BENCH=${MAX_BENCH:-8}              # campaign cap
CPU_FAST=${CPU_FAST:-0.52}
DEADLINE=${DEADLINE:-$(( $(date +%s) + 18000 ))}   # default: 5 h
CP='target/scala-2.13/classes:/opt/spark/jars/*'
last_bench=0
benches=0

while [ "$(date +%s)" -lt "$DEADLINE" ] && [ "$benches" -lt "$MAX_BENCH" ]; do
  probe=$(java -cp "$CP" graft.tools.RefCalibrate 2 2>/dev/null | tail -1)
  now=$(date -u +%FT%TZ); nows=$(date +%s)
  echo "$now $probe" >> "$SCOUT_LOG"
  verdict=$(python3 - "$probe" <<'EOF'
import json, sys
try: d = json.loads(sys.argv[1])
except Exception: print("parse_error"); sys.exit()
cpu = d["cpu_ref_wall"][0]; mem = d["mem_ref_wall"][0]
par = d["par_ref_delivered"][2]; thr = d["threads"]
# ext gate (added after capture #2): a probe can read full delivered
# cores while 2-3 external cores burn — those intruders then stamp the
# capture degraded anyway. Same 0.5-core bound RefCalibrate's idle
# verdict uses over the timed span.
ext = max(d.get("run_ext_cores", 0.0), 0.0)
fast = cpu <= float(__import__("os").environ.get("CPU_FAST", "0.52"))
clean = cpu <= 0.70 and mem <= 0.12 and par >= 0.8 * thr and ext <= 0.5
print("fast" if fast else ("clean" if clean else "busy"))
EOF
)
  echo "$now verdict=$verdict benches=$benches" >> "$SCOUT_LOG"
  if [ "$verdict" = fast ] || { [ "$verdict" = clean ] && [ $((nows - last_bench)) -ge "$BENCH_SPACING" ]; }; then
    echo "$now launching capture (verdict=$verdict)" >> "$SCOUT_LOG"
    # via sbt, exactly like every prior capture (same forked-JVM flags,
    # same idle sbt parent) — totals must stay band-comparable
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      sbt -batch "runMain graft.Bench" 2>/dev/null | grep -F '"metric"' >> "$SCOUT_LOG"
    last_bench=$(date +%s); benches=$((benches + 1))
    grep -o '"capture_profile":"[a-z]*"' BENCH_LOCAL.json >> "$SCOUT_LOG" || true
  fi
  sleep "$PROBE_EVERY"
done
echo "$(date -u +%FT%TZ) scout done: $benches captures" >> "$SCOUT_LOG"
