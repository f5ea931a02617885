#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query dumped
by `graft.Verify`, run its oracle SQL in DuckDB over the same parquet
tables and compare schema + rows (column-name-sorted, like the driver).

Usage: local_verify.py <verify_out_dir> [sf_dir]
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v


def frame_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = tuple(cols[i] for i in order)
    data = sorted((tuple(canon(r[i]) for i in order) for r in rows),
                  key=lambda t: tuple((x is None, type(x).__name__, str(x))
                                      for x in t))
    return names, data


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
        got = con.execute(
            f"SELECT * FROM read_parquet({[str(f) for f in files]})").fetchall()
        got_cols = [d[0] for d in con.description]
        if name not in oracle:
            results[name] = f"ROWS-ONLY ({len(got)} rows)"
            continue
        try:
            want = con.execute(oracle[name]).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            results[name] = f"ORACLE-ERROR: {e}"
            continue
        gn, gd = frame_sig(got_cols, got)
        wn, wd = frame_sig(want_cols, want)
        if gn != wn:
            results[name] = f"SCHEMA-MISMATCH spark={gn} duckdb={wn}"
        elif gd != wd:
            diff = next((i, a, b) for i, (a, b) in enumerate(zip(gd + [None] * len(wd), wd + [None] * len(gd))) if a != b)
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
