#!/usr/bin/env python3
"""Rank layout-serialized stages in a Spark event log, per query.

The diagnostic that found the round-12 parallelism-floor win: a stage
whose duration is carried by <= 2 busy tasks is serialized by physical
layout (single-row-group parquet, un-split file) no matter how many
empty splits surround it — split-size tuning cannot fix it, only a
rebalance ahead of the expensive work can (see Tables.widened).

Capture a log (BenchUtil.execNoop tags every job with its query name):

    SPARK_GRAFT_BENCH_RUNS=1 \
    SPARK_GRAFT_BENCH_OUT=/tmp/census.json \
    SPARK_GRAFT_BENCH_HISTORY=/tmp/census_hist.json \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    sbt 'set run/javaOptions ++= Seq("-Dspark.eventLog.enabled=true",
                                     "-Dspark.eventLog.dir=file:/tmp/graft_evt")' \
        "runMain graft.Bench"
    python3 tools/stage_census.py /tmp/graft_evt

Never point SPARK_GRAFT_BENCH_OUT/_HISTORY at the committed artifacts for
a census run — a single-pass contended capture must not min-merge into the
real history.
"""
import glob
import json
import os
import subprocess
import sys


def read_events(log_dir):
    """Yield parsed events from the newest eventlog under log_dir
    (plain or zstd rolling format)."""
    entries = sorted(glob.glob(os.path.join(log_dir, "*")))
    if not entries:
        sys.exit(f"no event logs under {log_dir}")
    newest = entries[-1]
    paths = (
        [p for p in glob.glob(os.path.join(newest, "*")) if "events" in os.path.basename(p)]
        if os.path.isdir(newest)
        else [newest]
    )
    for path in sorted(paths):
        if path.endswith(".zstd"):
            text = subprocess.run(
                ["zstd", "-dc", path], capture_output=True, text=True, check=True
            ).stdout
        else:
            with open(path) as fh:
                text = fh.read()
        for line in text.splitlines():
            try:
                yield json.loads(line)
            except json.JSONDecodeError:
                continue


def main():
    log_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_evt"
    min_dur_ms = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    max_busy = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    stage_tasks, stage_info, stage_group = {}, {}, {}
    for e in read_events(log_dir):
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            group = (e.get("Properties") or {}).get("spark.jobGroup.id", "?")
            for s in e["Stage Infos"]:
                stage_group[s["Stage ID"]] = group
        elif ev == "SparkListenerTaskEnd":
            tm = e.get("Task Metrics") or {}
            run = tm.get("Executor Run Time", 0)
            rec = (tm.get("Input Metrics") or {}).get("Records Read", 0) + (
                tm.get("Shuffle Read Metrics") or {}
            ).get("Total Records Read", 0)
            stage_tasks.setdefault(e["Stage ID"], []).append((run, rec))
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            if si.get("Submission Time") and si.get("Completion Time"):
                stage_info[si["Stage ID"]] = (
                    si["Completion Time"] - si["Submission Time"],
                    si["Number of Tasks"],
                )

    per_query = {}
    for sid, (dur, _ntasks) in stage_info.items():
        tasks = stage_tasks.get(sid, [])
        if not tasks or dur < min_dur_ms:
            continue
        busy = sum(1 for run, rec in tasks if rec > 0 and run > 30)
        if 0 < busy <= max_busy:
            group = stage_group.get(sid, "?")
            agg = per_query.setdefault(group, [0.0, 0])
            agg[0] += dur / 1e3
            agg[1] += 1

    ranked = sorted(per_query.items(), key=lambda kv: -kv[1][0])
    total = sum(v[0] for _, v in ranked)
    print(
        f"layout-serialized stage time: {total:.1f}s across {len(ranked)} queries"
        f" (dur>={min_dur_ms}ms, busy<={max_busy})"
    )
    for group, (secs, n) in ranked:
        print(f"{secs:6.2f}s  {n:2d} stages  {group}")


if __name__ == "__main__":
    main()
