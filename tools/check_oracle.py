#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: check_oracle.py <verifyOutDir> <sfDir>

For each query subdir in <verifyOutDir> (parquet written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the sf parquet
tables and compares: column names (sorted), row count, and cell values
(rows sorted by all columns; floats compared to 9 significant digits).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return "bytes:" + v.hex()[:64]
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())

    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(p for p in out_dir.iterdir() if p.is_dir()):
        name = qdir.name
        got = con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        if name not in oracle:
            ok = len(got_rows) > 0
            n_rowsonly += 1
            print(f"{'ROWS-OK' if ok else 'ROWS-EMPTY!':12s} {name:28s} rows={len(got_rows)}")
            if not ok:
                n_fail += 1
            continue
        try:
            want = con.execute(oracle[name])
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
        except Exception as e:
            print(f"{'SQL-ERR':12s} {name:28s} {e}")
            n_fail += 1
            continue
        gc, gr = norm_rows(got_cols, got_rows)
        wc, wr = norm_rows(want_cols, want_rows)
        if gc != wc:
            print(f"{'COLS-DIFF':12s} {name:28s} spark={gc} duck={wc}")
            n_fail += 1
        elif len(gr) != len(wr):
            print(f"{'NROWS-DIFF':12s} {name:28s} spark={len(gr)} duck={len(wr)}")
            n_fail += 1
        elif gr != wr:
            diffs = [(a, b) for a, b in zip(gr, wr) if a != b][:3]
            print(f"{'VALS-DIFF':12s} {name:28s} first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"{'PASS':12s} {name:28s} rows={len(gr)}")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
