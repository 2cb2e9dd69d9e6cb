#!/usr/bin/env python3
"""Clean-record regression arm: is a capture's excess over BENCH_CLEAN a
CODE question or a host window?

The host moves every query by a roughly common factor (the measured
clean classes differ ~14% uniformly; degraded windows 1.1-1.5x), while a
code regression moves the AFFECTED queries only. So: per-query ratio
candidate/record, take the MEDIAN ratio as the host factor of the
candidate's window, and flag queries whose residual ratio (own ratio /
host factor) still exceeds the flag band. A flagged query is a
plan/code question for a worktree A/B; zero flags means the capture's
total is explained by the host window alone.

Usage: tools/clean_regress.py [candidate.json] [record.json]
  candidate defaults to BENCH_LOCAL.json; record defaults to
  BENCH_CLEAN.<sf>.json for the candidate's sf tag.
Exit code 1 when any query is flagged (so a gate can consume it).

Thresholds: residual ratio > 1.30 AND absolute excess over the
host-scaled record > 0.15 s. The residual band is set from the measured
per-query run-variance at matched host class (r17 adjudication: hotspot
ratios vs the clean record held within ~1.2 at matched windows; the
planted-regression validation in docs/bench_val_clean_regress.md shows
a forced-shuffle pessimization landing well above it); the absolute
floor keeps sub-second noise (q15/q49 class) out, same rationale as the
retry trigger's 0.5 s floor.
"""
import json
import re
import sys
from pathlib import Path

RESIDUAL_FLAG = 1.30
EXCESS_FLOOR_S = 0.15


def load(path):
    d = json.loads(Path(path).read_text())
    qs = {k: float(v) for k, v in d.get("queries", {}).items()
          if re.fullmatch(r"q\d+_[a-z0-9_]+", k)}
    if not qs:
        raise SystemExit(
            f"{path}: no full-name query medians — this tool reads FULL "
            "artifacts (BENCH_LOCAL.json / BENCH_CLEAN.<sf>.json), not the "
            "driver's compact-tail wrapper (BENCH_rNN.json)")
    return d, qs


def main(argv):
    cand_path = argv[1] if len(argv) > 1 else "/root/repo/BENCH_LOCAL.json"
    cand, cq = load(cand_path)
    sf_tag = Path(str(cand.get("sf", "sf0.1"))).name
    rec_path = (argv[2] if len(argv) > 2
                else f"/root/repo/BENCH_CLEAN.{sf_tag}.json")
    rec, rq = load(rec_path)

    shared = sorted(set(cq) & set(rq))
    if not shared:
        print(json.dumps({"tool": "clean_regress", "error": "no shared queries"}))
        return 2
    ratios = {n: cq[n] / rq[n] for n in shared if rq[n] > 0}
    if not ratios:
        print(json.dumps({"tool": "clean_regress",
                          "error": "no positive record medians"}))
        return 2
    # median per BenchUtil.median's convention: midpoint average for even
    # counts (not the upper-middle element, which biases the host factor
    # high and desensitizes residual flags)
    rv = sorted(ratios.values())
    mid = len(rv) // 2
    host = rv[mid] if len(rv) % 2 == 1 else (rv[mid - 1] + rv[mid]) / 2.0
    flagged = []
    for n in shared:
        if n not in ratios:
            continue
        residual = ratios[n] / host
        excess = cq[n] - rq[n] * host
        if residual > RESIDUAL_FLAG and excess > EXCESS_FLOOR_S:
            flagged.append({
                "query": n, "candidate_s": round(cq[n], 3),
                "record_s": round(rq[n], 3),
                "ratio": round(ratios[n], 3),
                "residual": round(residual, 3),
                "excess_s": round(excess, 3)})
    flagged.sort(key=lambda f: -f["excess_s"])
    out = {
        "tool": "clean_regress",
        "candidate": cand_path, "record": rec_path,
        "candidate_total": cand.get("value"),
        "record_total": rec.get("value"),
        "candidate_profile": cand.get("capture_profile"),
        "candidate_class": cand.get("capture_class"),
        "record_class": rec.get("capture_class"),
        "shared_queries": len(shared),
        "host_factor": round(host, 3),
        "residual_flag_band": RESIDUAL_FLAG,
        "excess_floor_s": EXCESS_FLOOR_S,
        "flagged": flagged,
    }
    # the regression rule is defined over CLEAN captures: under a degraded
    # window a transient burst hits individual queries NON-uniformly, so a
    # residual flag there is advisory — adjudicate the flagged query's own
    # ext/steal stamps before burning a worktree A/B (the r17 94.2 s
    # degraded capture flags q57 at residual 1.40 this way; its per-query
    # stamps, not this tool, say whether that was a burst)
    if cand.get("capture_profile") == "clean":
        out["verdict"] = "code_question" if flagged else "host_only"
    else:
        out["verdict"] = "degraded_window_advisory"
    # a missing query on either side is itself a finding (renamed/failed)
    only_cand = sorted(set(cq) - set(rq))
    only_rec = sorted(set(rq) - set(cq))
    if only_cand:
        out["only_in_candidate"] = only_cand
    if only_rec:
        out["only_in_record"] = only_rec
    print(json.dumps(out))
    return 1 if out["verdict"] == "code_question" else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
