#!/usr/bin/env python3
"""Bit-level float audit: every double dump column vs the DuckDB oracle.

The design rule for float outputs is that both engines execute the
IDENTICAL IEEE op sequence (exact integer folds with one final division,
identical correctly-rounded casts), so every cell is bit-identical — not
merely within the compare's rounding tolerance. A column that matches only
after canonicalization rounding is a latent red row: it flips the moment
values drift onto a rounding boundary or the driver's compare gets more
precise (the q140 lesson, and round 10's q39: 37% of its running-sum cells
differed in the last ulp behind a green row).

Usage: check_float_bits.py <sfDir> <verifyOutDir>
Exit 0 = every float64 cell of every dump is bit-identical to the oracle
(NaN==NaN, None==None). Anything else lists the offending columns.

Builder-side validation tool only — NOT part of the shipped library.
"""
import json
import math
import struct
import sys
from pathlib import Path

import duckdb
import pyarrow.dataset as pads

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def same_bits(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return struct.pack('>d', a) == struct.pack('>d', b)
    return False


def main(sf_dir, out_dir):
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
    n_cols = 0
    fails = []
    for name, sql in sorted(oracle.items()):
        d = Path(out_dir) / name
        if not d.is_dir():
            continue
        got = pads.dataset(d, format="parquet").to_table().to_pandas()
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            fails.append(f"{name}: oracle error {e}")
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        for c in got.columns:
            if str(got[c].dtype) != "float64":
                continue
            if c not in want.columns:
                # a float dump column the oracle frame doesn't even have is
                # an alias drift — skipping it silently would report a
                # green bit audit for a column that was never compared
                fails.append(f"{name}.{c}: dump float column missing from "
                             f"oracle columns {sorted(want.columns)}")
                continue
            n_cols += 1
            g, w = got[c].tolist(), want[c].tolist()
            if len(g) != len(w):
                fails.append(f"{name}.{c}: row count {len(g)} vs {len(w)}")
                continue
            # pandas surfaces SQL NULL in float columns as nan — treat a
            # nan/None mismatch as a None-level match only if both sides
            # null; the compare above already owns value-level semantics
            diffs = sum(1 for a, b in zip(g, w) if not same_bits(a, b))
            if diffs:
                fails.append(f"{name}.{c}: {diffs}/{len(g)} cells not "
                             f"bit-identical — green only through compare "
                             f"rounding; make the op sequence identical "
                             f"(integer fold + one final division)")
    for f in fails:
        print(f"FAIL {f}")
    print(f"== {n_cols} float columns, {len(fails)} fail ==")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
