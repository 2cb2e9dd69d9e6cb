#!/usr/bin/env python3
"""Executable pins for the oracle-compare canonicalization assumptions.

The driver compares the pyarrow-read Spark dump against the DuckDB-read
oracle by canonical STRING per cell. Two rounds of q140 debugging were spent
re-deriving which representations collide and which don't — this file makes
the table executable so the next change to check_oracle.py (or to a dump
schema) is tested against reality, not folklore.

Run: python3 tools/test_canon.py   (exit 0 = all pins hold)
Builder-side validation tool only — NOT part of the shipped library.
"""
import decimal
import math
import sys
import tempfile
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).parent))
from check_oracle import canon, read_spark_dump  # noqa: E402

FAILS = []


def pin(cond, msg):
    if not cond:
        FAILS.append(msg)
        print(f"PIN FAIL: {msg}")


# --- the q140 class: declared-scale decimal vs float -----------------------
# pyarrow surfaces parquet decimals as decimal.Decimal with the declared
# scale's trailing zeros; DuckDB fetchdf() surfaces the oracle's value as a
# float. Identical values, different canonical strings — at ANY precision.
d = decimal.Decimal("194.280000")
pin(str(d) == "194.280000", "Decimal keeps declared-scale trailing zeros")
pin(canon(d) == "194.280000", "canon(Decimal) keeps trailing zeros")
pin(canon(194.28) == "194.28", "canon(float) drops trailing zeros")
pin(canon(d) != canon(194.28),
    "trailing-zero decimal vs float MUST diverge (q140 root cause)")
# ... and a trailing-zero-FREE decimal still diverges from the float in this
# replica (str keeps 12 sig figs, %.9g doesn't) — q03's class is caught here
# even on values where the DRIVER's str-vs-str compare happens to collide:
pin(canon(decimal.Decimal("1061400897.67")) == "1061400897.67", "Decimal str")
pin(canon(1061400897.67) == "1.0614009e+09", "%.9g float canon")
pin(canon(decimal.Decimal("1061400897.67")) != canon(1061400897.67),
    "q03 class: decimal dump diverges from float oracle in the replica")

# --- the fix's premise: decimal->double is symmetric ------------------------
# Spark casts via BigDecimal.doubleValue (correctly rounded); DuckDB casts an
# int64-backed decimal as backing/10^scale in double arithmetic. For backing
# < 2^53 both are the same correctly-rounded IEEE double.
for txt, backing, scale in [
        ("194.280000", 194280000, 6),
        ("1061400897.67", 106140089767, 2),
        ("0.000001", 1, 6),
        ("-7.100000", -7100000, 6),
        ("123456789012.345678", 123456789012345678, 6)]:
    spark_side = float(decimal.Decimal(txt))  # correctly rounded, like BigDecimal
    duck_side = float(backing) / (10.0 ** scale)
    pin(spark_side == duck_side and canon(spark_side) == canon(duck_side),
        f"decimal->double divergence for {txt}")

# --- None vs NaN ------------------------------------------------------------
# pandas renders a float-column null as nan on both read paths; an object
# column keeps None. str() of the two differ — mixing them across sides
# would be a silent mismatch.
pin(canon(None) == "None", "canon(None)")
pin(canon(float("nan")) == "nan", "canon(nan) via %.9g")
pin(canon(None) != canon(float("nan")),
    "None vs NaN diverge — null columns must be float-typed on both sides")

# --- bool -------------------------------------------------------------------
# numpy.bool_ and python bool both str() as True/False; 0/1 ints do NOT.
pin(canon(True) == "True" and canon(False) == "False", "canon(bool)")
pin(canon(1) == "1" and canon(True) != canon(1),
    "bool vs int diverge — gap_filled-style flags must be bool on both sides")

# --- floats -----------------------------------------------------------------
pin(canon(0.1 + 0.2) == canon(0.30000000000000004) == "0.3",
    "%.9g absorbs one-ulp float noise")
pin(canon(-0.0) == "-0", "negative zero renders distinctly (-0 vs 0)")
pin(canon(1e300) == "1e+300", "large-float rendering")
pin(math.isinf(float("inf")) and canon(float("inf")) == "inf", "inf rendering")

# --- end-to-end: a decimal parquet dump must be flagged by the replica ------
with tempfile.TemporaryDirectory() as td:
    tab = pa.table({
        "sum_value": pa.array([decimal.Decimal("194.280000")],
                              type=pa.decimal128(18, 6)),
        "n": pa.array([3], type=pa.int64())})
    pq.write_table(tab, Path(td) / "part-0.parquet")
    df, decs = read_spark_dump(td)
    pin(decs == ["sum_value: decimal128(18, 6)"],
        f"read_spark_dump flags int64-backed decimal(18,6), got {decs}")
    pin(isinstance(df["sum_value"].iloc[0], decimal.Decimal),
        "read_spark_dump keeps decimals as Decimal (driver-faithful)")
    pin(canon(df["sum_value"].iloc[0]) == "194.280000",
        "round-tripped decimal keeps trailing zeros (reproduces driver red)")

    tab2 = pa.table({"sum_value": pa.array([194.28], type=pa.float64())})
    pq.write_table(tab2, Path(td) / "d2.parquet")
    df2, decs2 = read_spark_dump(str(Path(td) / "d2.parquet"))
    pin(decs2 == [] and canon(df2["sum_value"].iloc[0]) == "194.28",
        "double dump is clean and canonicalizes to the oracle's float string")

# --- order-key audit parser: literals must not desync depth tracking ------
# a quoted '(' / ')' / 'order by' inside a string literal would shift the
# paren-depth bookkeeping and let the audit validate the WRONG ORDER BY
from check_order_keys import final_order_keys  # noqa: E402

keys = final_order_keys(
    "SELECT * FROM t WHERE suffix = ')' AND tag != '(' ORDER BY id")
pin(keys == [('col', 'id', False)],
    f"literal parens don't desync the outer-ORDER BY scan, got {keys}")
keys = final_order_keys(
    "SELECT * FROM t WHERE note LIKE '%order by%' ORDER BY k DESC")
pin(keys == [('col', 'k', False)],
    f"a quoted 'order by' is not treated as the sort clause, got {keys}")
keys = final_order_keys(
    "SELECT a, count(*) AS n FROM (SELECT a FROM t ORDER BY a) s GROUP BY a")
pin(keys is None,
    f"a subquery-only ORDER BY is not reported as the outer sort, got {keys}")
try:
    final_order_keys("SELECT a FROM t WHERE b = 'x' ) ORDER BY a")
    pin(False, "negative depth must raise, not silently misparse")
except ValueError:
    pass

# --- clean_regress verdict arms (round 18) ---------------------------------
# The regression-arm tool must (a) flag a genuine per-query code regression
# through a uniform host factor, (b) reserve "code_question" for CLEAN
# candidates, (c) call an unflagged clean capture "host_only". Synthetic
# artifacts pin all three (the wild validation is the planted-pessimization
# capture in docs/bench_val_clean_regress.md).
import json as _json
import subprocess as _sp

def _regress(candidate, record):
    with tempfile.TemporaryDirectory() as td:
        c = Path(td) / "cand.json"
        r = Path(td) / "rec.json"
        c.write_text(_json.dumps(candidate))
        r.write_text(_json.dumps(record))
        out = _sp.run([sys.executable,
                       str(Path(__file__).parent / "clean_regress.py"),
                       str(c), str(r)], capture_output=True, text=True)
        return _json.loads(out.stdout), out.returncode

_rec = {"value": 10.0, "sf": "/root/testdata/sf0.1", "capture_profile": "clean",
        "queries": {f"q{i:02d}_x{i}": 1.0 for i in range(1, 11)}}
# uniform 1.2x host window + one 3x query: only that query flags
_cand_q = dict(_rec, value=14.4, queries={
    k: (3.0 if k == "q05_x5" else 1.2) for k in _rec["queries"]})
_o, _rc = _regress(_cand_q, _rec)
pin(_o["verdict"] == "code_question" and _rc == 1 and
    [f["query"] for f in _o["flagged"]] == ["q05_x5"],
    f"clean candidate with one 3x query must be code_question on it, got {_o}")
pin(abs(_o["host_factor"] - 1.2) < 1e-9,
    f"median ratio must read the 1.2x host window, got {_o['host_factor']}")
# same shape but degraded profile: advisory, exit 0
_o, _rc = _regress(dict(_cand_q, capture_profile="degraded"), _rec)
pin(_o["verdict"] == "degraded_window_advisory" and _rc == 0,
    f"degraded candidate never returns code_question, got {_o['verdict']}")
# uniform 1.3x window, no outlier: host_only
_o, _rc = _regress(dict(_rec, value=13.0, capture_profile="clean",
                        queries={k: 1.3 for k in _rec["queries"]}), _rec)
pin(_o["verdict"] == "host_only" and _rc == 0 and not _o["flagged"],
    f"uniformly slow clean capture is the host, not code, got {_o}")
# sub-noise-floor excess never flags (the q15/q49 class)
_o, _rc = _regress(dict(_rec, capture_profile="clean", queries=dict(
    _rec["queries"], q05_x5=1.0, q06_x6=1.0, **{"q11_tiny": 0.14}),
    value=10.14), dict(_rec, queries=dict(_rec["queries"],
    **{"q11_tiny": 0.05})), )
pin(all(f["query"] != "q11_tiny" for f in _o["flagged"]),
    f"0.09 s excess on a 0.05 s query stays under the floor, got {_o}")
# even-count median is the MIDPOINT average (r18 ADVICE: the upper-middle
# element biases the host factor toward the higher ratio and desensitizes
# residual flags) — ratios [1.0,1.0,1.4,1.4] must read 1.2, not 1.4
_rec4 = {"value": 4.0, "sf": "/root/testdata/sf0.1",
         "capture_profile": "clean",
         "queries": {f"q{i:02d}_y{i}": 1.0 for i in range(1, 5)}}
_o, _rc = _regress(dict(_rec4, value=4.8, queries={
    "q01_y1": 1.0, "q02_y2": 1.0, "q03_y3": 1.4, "q04_y4": 1.4}), _rec4)
pin(abs(_o["host_factor"] - 1.2) < 1e-9,
    f"even-count host factor must midpoint-average, got {_o['host_factor']}")
# all-zero record medians (hand-edited/corrupt record): structured error +
# exit 2, same path as the no-shared-queries case — never an IndexError
_o, _rc = _regress(_rec4, dict(_rec4, queries={
    k: 0.0 for k in _rec4["queries"]}))
pin(_rc == 2 and _o.get("error") == "no positive record medians",
    f"empty ratio set must emit the structured error, got {_o} rc={_rc}")

if FAILS:
    print(f"== {len(FAILS)} canonicalization pins FAILED ==")
    sys.exit(1)
print("== all canonicalization pins hold ==")
