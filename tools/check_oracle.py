#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir> [nameFilter]

Pass the SAME nameFilter given to a filtered Verify run (round 18: the
shared contract is comma-separated substring ALTERNATIVES, empty segments
dropped — BenchUtil.parseNameFilters): dump dirs absent because the filter
excluded them are then skipped; in an unfiltered run an absent dump dir
means the query CRASHED during Verify and is counted as FAIL (Verify also
exits nonzero, but the masking must not depend on the caller checking
both).

DRIVER-FAITHFUL READ PATHS (the rounds-8-AND-9 lesson): the driver reads the
SPARK dump through pyarrow and the oracle through DuckDB. The two readers
agree on every type except decimals — at ANY precision, pyarrow surfaces a
parquet decimal as `decimal.Decimal` with the full declared scale
("194.280000") while the oracle side surfaces a float ("194.28"):
bit-identical values, different canonical strings, hash FAIL. Round 8's
revision of this script read BOTH sides through DuckDB `fetchdf()`, erasing
the asymmetry; round 9's revision float-converted precision<=18 decimals —
each shipped q140 as green while the driver failed it, because the driver
NEVER converts decimals to float at any precision (verified empirically in
round 9 on all 3,600 q140 rows of an int64-backed decimal(18,6)). So:
Spark side is read via pyarrow here, decimal cells are kept as
`decimal.Decimal` so driver divergence REPRODUCES locally, and any dump
column declared as decimal at any width is flagged as a hygiene FAIL
outright — Verify refuses to write such dumps and SparkEntrySpec gates the
registry, but the replica must also catch a dump produced by older code.
Run `python3 tools/test_canon.py` for the executable canonicalization pins.

Registers each parquet table from sfDir under its bare name, runs each SQL in
<verifyOutDir>/oracle_sql.json, and compares against the Spark parquet dump in
<verifyOutDir>/<name>/. Compare = sort columns by name, then hash every value
row-by-row (strict), plus a row-order-insensitive fallback diagnostic.

Builder-side validation tool only — NOT part of the shipped library.
"""
import json
import sys
from pathlib import Path

import duckdb
import pyarrow.dataset as pads
import pyarrow.types as patypes

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def read_spark_dump(spark_dir):
    """Read a Verify dump the way the driver does: pyarrow, not DuckDB.

    Returns (DataFrame, [decimal column descriptions]). Decimal columns at
    EVERY precision are LEFT as decimal.Decimal objects — the driver never
    float-converts them, so their canonical string keeps the declared
    scale's trailing zeros and diverges from the oracle's float exactly as
    the driver's hash does. Any decimal column is also reported so the
    caller can fail the hygiene gate outright.
    """
    table = pads.dataset(spark_dir, format="parquet").to_table()
    decs = [f"{f.name}: {f.type}" for f in table.schema
            if patypes.is_decimal(f.type)]
    return table.to_pandas(), decs


def main(sf_dir, out_dir, name_filter=""):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            # driver testdata ships single-file tables; builder-side scale
            # replicas (graft.tools.ScaleData) are Spark directory-parquet
            # -- register those through a glob, which DuckDB needs for dirs
            src = f"{p}/*.parquet" if p.is_dir() else str(p)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            # only a name-filtered Verify run may legitimately omit a dump;
            # in a full run an absent dir means the query crashed mid-Verify
            alts = [a.strip() for a in name_filter.split(",") if a.strip()]
            if alts and not any(a in name for a in alts):
                n_skip += 1
                continue
            print(f"FAIL {name}: no dump dir (query crashed during Verify?)")
            n_fail += 1
            continue
        try:
            got, decs = read_spark_dump(spark_dir)
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if decs:
            # hygiene gate for the CLASS of bug, independent of whether the
            # values happen to collide on this dataset (a trailing-zero-free
            # decimal would string-match the float today and flip red on the
            # next data regeneration — q03's round-9 near-miss)
            print(f"FAIL {name}: dump has DecimalType columns ({decs}) — "
                  f"pyarrow keeps declared-scale trailing zeros, the oracle "
                  f"surfaces floats; cast the final projection to double "
                  f"(or bigint micros) on both sides")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs "
                  f"{list(want.columns)}")
            n_fail += 1
            continue
        dt_diff = [(c, str(got[c].dtype), str(want[c].dtype))
                   for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
        if dt_diff:
            print(f"WARN {name}: dtype drift {dt_diff}")
        # The driver's pandas sort_values/hash compare crashes on binary and
        # list cells ("unhashable type") — fail HERE so it never ships.
        # Project arrays to comma-joined strings and binaries to hex on BOTH
        # sides (round-3 lesson: q52/q74/q98).
        nonscalar = [
            c for df in (got, want) for c in df.columns
            if df[c].map(lambda v: isinstance(v, (bytes, bytearray, list))
                         or type(v).__name__ == "ndarray").any()]
        if nonscalar:
            print(f"FAIL {name}: non-scalar result columns "
                  f"{sorted(set(nonscalar))} — the driver compare cannot "
                  f"hash these; emit hex/comma-joined projections")
            n_fail += 1
            continue
        g_rows = [tuple(canon(v) for v in r)
                  for r in got.itertuples(index=False)]
        w_rows = [tuple(canon(v) for v in r)
                  for r in want.itertuples(index=False)]
        if g_rows == w_rows:
            print(f"PASS {name} ({len(g_rows)} rows)")
            n_pass += 1
        elif sorted(g_rows) == sorted(w_rows):
            print(f"WARN {name}: values match but row ORDER differs")
            n_fail += 1
        else:
            only_g = set(g_rows) - set(w_rows)
            only_w = set(w_rows) - set(g_rows)
            print(f"FAIL {name}: {len(g_rows)} vs {len(w_rows)} rows; "
                  f"spark-only={list(only_g)[:2]} oracle-only={list(only_w)[:2]}")
            n_fail += 1
    skipped = f", {n_skip} not dumped" if n_skip else ""
    print(f"== {n_pass} pass, {n_fail} fail{skipped} ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else ""))
