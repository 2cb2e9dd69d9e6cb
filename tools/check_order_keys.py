#!/usr/bin/env python3
"""Sort-key uniqueness audit over a Verify dump tree.

The driver compare is strict row-by-row, so every multi-row query must end
in an ORDER BY that is a UNIQUE key of its result: a tie would leave the
tied rows' relative order engine-arbitrary (Spark's depends on partitioning,
DuckDB's on its own pipeline), and the pair can flip to a red hash row on
any data regeneration or parallelism change even though the VALUES match.
This audit parses each oracle's final ORDER BY and checks key uniqueness
against the actual dump, so a latent tie ships as a loud FAIL here instead
of a future driver red.

Usage: check_order_keys.py <verifyOutDir>
Exit 0 = every multi-row dump's sort key is unique (or provably exempt).
Queries whose final ORDER BY uses expressions/positions this parser can't
map to dump columns are listed for manual review and DO fail the run —
rewrite the oracle to sort by named output columns (the dump compare only
sees output columns anyway).

Builder-side validation tool only — NOT part of the shipped library.
"""
import json
import re
import sys
from pathlib import Path

import pyarrow.dataset as pads


def split_top_level(s, sep=','):
    """Split on sep outside parentheses (ORDER BY lists may contain CASTs)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == '(':
            depth += 1
        elif ch == ')':
            if depth == 0:  # closing a paren the ORDER BY match leaked into
                break
            depth -= 1
        if ch == sep and depth == 0:
            parts.append(''.join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append(''.join(cur))
    return [p.strip() for p in parts if p.strip()]


def final_order_keys(sql):
    """Column names of the OUTERMOST ORDER BY (paren depth 0), or None.

    Window specs (`OVER (... ORDER BY ...)`) and subquery sorts all live
    inside parentheses; the statement's result order comes only from an
    ORDER BY at depth 0. A depth-0 scan also makes 'last in text' correct
    when a WITH chain puts windows after the outer clause.

    String literals are masked (equal-length, so offsets stay valid)
    before the token scan: a quoted '(' / ')' / 'order by' would silently
    desynchronize the depth tracking and let the audit validate the wrong
    ORDER BY. Negative depth — the symptom of exactly that class of
    parse failure — raises instead of silently misclassifying.
    """
    # mask '...literals...' (with '' escapes) to spaces of the same length
    masked = re.sub(r"'(?:[^']|'')*'",
                    lambda m: "'" + " " * (len(m.group(0)) - 2) + "'", sql)
    depth = 0
    last = None
    for m in re.finditer(r'[()]|ORDER\s+BY', masked, re.I):
        tok = m.group(0)
        if tok == '(':
            depth += 1
        elif tok == ')':
            depth -= 1
            if depth < 0:
                raise ValueError(
                    "unbalanced parens while scanning for the outer "
                    "ORDER BY (depth went negative) — oracle SQL not "
                    "parseable by this audit: " + sql[:120])
        elif depth == 0:
            last = m.end()
    if last is None:
        return None
    cols = []
    for c in split_top_level(sql[last:].strip()):
        has_nulls_dir = bool(re.search(r'NULLS\s+(FIRST|LAST)', c, re.I))
        # CAST(col AS t): the sort key is the CAST VALUE — a narrowing cast
        # can create ties a unique raw column doesn't have, so the checker
        # evaluates the key (numeric conversion; falls back to the raw
        # column for varchar casts, where distinct values stay distinct)
        # the type charclass includes ',' for parameterized types like
        # DECIMAL(12,2) — without it a valid cast key falls through to the
        # generic branch and becomes the garbage key "CAST(col"
        m = re.fullmatch(r'CAST\s*\(\s*([A-Za-z_][\w.]*)\s+AS\s+[\w(), ]+\)\s*'
                         r'(?:ASC|DESC)?\s*(?:NULLS\s+(?:FIRST|LAST))?',
                         c.strip(), re.I)
        if m:
            cols.append(('cast', m.group(1).split('.')[-1].strip('"'),
                         has_nulls_dir))
            continue
        c = c.split()[0]                  # drop ASC/DESC/NULLS FIRST...
        c = c.split('.')[-1]              # drop table/alias prefix
        c = c.strip('"')                  # unquote identifiers
        cols.append(('col', c, has_nulls_dir))
    return cols


def main(out_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    n_ok = 0
    fails = []
    for name, sql in sorted(oracle.items()):
        d = out / name
        if not d.is_dir():
            continue
        tab = pads.dataset(d, format="parquet").to_table()
        if tab.num_rows <= 1:
            n_ok += 1  # a 0/1-row result needs no ordering
            continue
        keys = final_order_keys(sql)
        if keys is None:
            fails.append(f"{name}: {tab.num_rows} rows but oracle has no "
                         f"ORDER BY")
            continue
        missing = [k for _, k, _ in keys if k not in tab.schema.names]
        if missing:
            fails.append(f"{name}: ORDER BY keys {missing} are not named "
                         f"output columns — unverifiable, sort by output "
                         f"columns instead")
            continue
        # a NULL in a sort key orders NULLS FIRST in Spark but NULLS LAST
        # in DuckDB — unique keys still produce different row orders unless
        # the oracle spells the direction out
        bare_null_keys = [
            k for _, k, has_dir in keys
            if not has_dir and tab.column(k).null_count > 0]
        if bare_null_keys:
            fails.append(f"{name}: sort keys {bare_null_keys} contain NULLs "
                         f"but carry no NULLS FIRST/LAST directive — Spark "
                         f"and DuckDB default opposite null orders")
            continue
        df = tab.to_pandas()
        import pandas as pd
        keydf = pd.DataFrame()
        for i, (kind, k, _) in enumerate(keys):
            col = df[k]
            if kind == 'cast':
                num = pd.to_numeric(col, errors='coerce')
                # numeric cast when it parses; varchar cast (all-NaN
                # conversion of a non-numeric column) is injective on
                # distinct values, so the raw column stands in.
                # In the MIXED case (some cells parse, some don't), the
                # NaN-as-equal behavior of duplicated() is CORRECT, not a
                # bug: a SQL numeric cast maps every unparseable cell to
                # NULL, so two such rows genuinely tie in the ORDER BY.
                col = num if not num.isna().all() else col
            keydf[f'k{i}'] = col
        dup = int(keydf.duplicated().sum())
        if dup:
            fails.append(f"{name}: {dup} of {tab.num_rows} rows tie on sort "
                         f"keys {[k for _, k, _ in keys]} — tie order is "
                         f"engine-arbitrary")
        else:
            n_ok += 1
    for f in fails:
        print(f"FAIL {f}")
    print(f"== {n_ok} ok, {len(fails)} fail ==")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
