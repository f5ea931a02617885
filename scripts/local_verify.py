#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query dumped
by `graft.Verify`, run its oracle SQL in DuckDB over the same parquet
tables and compare schema + rows (column-name-sorted, like the driver).

Comparison is dtype-strict: both sides are materialized through pandas
(the driver's path), so DuckDB's HUGEINT->float64 promotion or an
int-vs-float mismatch FAILS here exactly like it fails on the driver,
and an array-typed output column (unhashable for the driver) FAILS
instead of being silently canonicalized.

Usage: local_verify.py <verify_out_dir> [sf_dir]
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    """Canonical cell value INCLUDING its runtime type name, so 2.0 != 2."""
    if v is None:
        return None
    # width-insensitive but KIND-strict: the driver hashes Python-level
    # values, where int32/int64 both become int but int-vs-float (the
    # HUGEINT->float64 class) mismatches
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("float", "NaN")
        return ("float", round(f, 9))
    if isinstance(v, (bool, np.bool_)):
        return ("bool", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("int", int(v))
    if isinstance(v, bytes):
        return ("bytes", v.hex())
    return (type(v).__name__, str(v))


def frame_sig(df):
    """(names, dtypes, sorted canonical rows) for a pandas frame, or an
    error string if the frame has a column the driver cannot hash."""
    cols = sorted(df.columns)
    for c in cols:
        if df[c].dtype == object:
            sample = next((x for x in df[c] if x is not None
                           and not (isinstance(x, float) and math.isnan(x))), None)
            if isinstance(sample, (list, tuple, np.ndarray, dict)):
                return f"ARRAY-TYPED column '{c}' (driver cannot hash it)"
    names = tuple(cols)
    dtypes = tuple(np.dtype(df[c].dtype).kind if df[c].dtype != object else "O"
                   for c in cols)
    rows = [tuple(canon(x) for x in r)
            for r in df[cols].itertuples(index=False, name=None)]
    rows.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return names, dtypes, rows


def main():
    out_dir = Path(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    results = {}
    for name in sorted(d.name for d in out_dir.iterdir() if d.is_dir()):
        files = list((out_dir / name).glob("*.parquet"))
        if not files:
            results[name] = "NO-OUTPUT"
            continue
        got_df = con.execute(
            f"SELECT * FROM read_parquet({[str(f) for f in files]})").df()
        if name not in oracle:
            results[name] = f"ROWS-ONLY ({len(got_df)} rows)"
            continue
        try:
            want_df = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-ERROR: {e}"
            continue
        g = frame_sig(got_df)
        w = frame_sig(want_df)
        if isinstance(g, str) or isinstance(w, str):
            results[name] = f"spark: {g}" if isinstance(g, str) else f"duckdb: {w}"
            continue
        gn, gt, gd = g
        wn, wt, wd = w
        if gn != wn:
            results[name] = f"SCHEMA-MISMATCH spark={gn} duckdb={wn}"
        elif gt != wt:
            results[name] = f"DTYPE-MISMATCH spark={list(zip(gn, gt))} duckdb={list(zip(wn, wt))}"
        elif gd != wd:
            diff = next((i, a, b) for i, (a, b) in enumerate(
                zip(gd + [None] * len(wd), wd + [None] * len(gd))) if a != b)
            results[name] = (f"DATA-MISMATCH rows spark={len(gd)} duckdb={len(wd)}; "
                             f"first diff @{diff[0]}: spark={diff[1]} duckdb={diff[2]}")
        else:
            results[name] = f"OK ({len(gd)} rows)"

    width = max(len(k) for k in results)
    fails = 0
    for k, v in results.items():
        ok = v.startswith("OK") or v.startswith("ROWS-ONLY")
        if not ok:
            fails += 1
        print(f"{'PASS' if ok else 'FAIL'}  {k:<{width}}  {v}")
    print(f"\n{len(results) - fails}/{len(results)} green")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
