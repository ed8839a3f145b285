#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare:
for each query dir under the Verify outDir, run the matching oracle SQL
in DuckDB over the sf tables and compare (sorted columns, sorted rows).
Usage: check_oracles.py <sfDir> <verifyOutDir>
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.10g}"
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return [c for _, c in sorted(zip(range(len(cols)), sorted(cols)))], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        got_rel = con.execute(f"SELECT * FROM '{qdir}/*.parquet'")
        got_cols = [c[0] for c in got_rel.description]
        got_rows = got_rel.fetchall()
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(got_rows)} rows "
                  f"({'OK' if got_rows else 'EMPTY!'})")
            continue
        want_rel = con.execute(oracles[name])
        want_cols = [c[0] for c in want_rel.description]
        want_rows = want_rel.fetchall()
        _, g = canon(got_rows, got_cols)
        _, w = canon(want_rows, want_cols)
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(want_cols)}")
            n_bad += 1
        elif g != w:
            n_bad += 1
            diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print(f"FAIL {name}: {len(g)} vs {len(w)} rows; first diffs: {diff}")
        else:
            n_ok += 1
            print(f"ok   {name}: {len(g)} rows")
    print(f"== {n_ok} ok, {n_bad} failed ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
