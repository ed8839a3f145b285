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

# Sketch aggregates (HLL, approx quantiles) are engine-specific by
# definition, so they carry no exact SQL oracle — but they ARE bounded:
# Spark's approx_count_distinct documents rsd=0.05 default, and
# percentile_approx(accuracy=1000) bounds the RANK error at 1/1000 (we
# allow 2% in value space, generous for the smooth price distribution).
# Compare against DuckDB's exact answers within those documented bounds:
# rows and grouping keys must match exactly, measures within rel_err.
TOLERANCE_ORACLES = {
    "q40_sketch_aggs": {
        "sql": "SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS approx_parts,"
               " MEDIAN(l_extendedprice) AS p50_price"
               " FROM lineitem GROUP BY 1",
        "keys": ["l_returnflag"],
        "rel_err": {"approx_parts": 0.15, "p50_price": 0.02},
    },
}


def check_tolerance(name, spec, got_cols, got_rows, con):
    want_rel = con.execute(spec["sql"])
    want_cols = [c[0] for c in want_rel.description]
    want_rows = want_rel.fetchall()
    if sorted(got_cols) != sorted(want_cols):
        print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(want_cols)}")
        return False
    def by_key(cols, rows):
        ki = [cols.index(k) for k in spec["keys"]]
        return {tuple(r[i] for i in ki): dict(zip(cols, r)) for r in rows}
    got, want = by_key(got_cols, got_rows), by_key(want_cols, want_rows)
    if sorted(got.keys()) != sorted(want.keys()):
        print(f"FAIL {name}: group keys {sorted(got.keys())} != {sorted(want.keys())}")
        return False
    worst = 0.0
    for k, w in want.items():
        for col, tol in spec["rel_err"].items():
            exact, approx = float(w[col]), float(got[k][col])
            err = abs(approx - exact) / max(abs(exact), 1e-12)
            worst = max(worst, err / tol)
            if err > tol:
                print(f"FAIL {name}: {col}@{k} approx={approx} exact={exact} "
                      f"rel_err={err:.4f} > {tol}")
                return False
    print(f"tol  {name}: {len(got)} rows, worst rel-err at "
          f"{worst:.2f}x of bound")
    return True


# Result-TYPE identity (the r5 driver-gate defect): DuckDB promotes
# integer sum() to HUGEINT (Arrow decimal128) while Spark emits LONG —
# values compare equal under repr() but the driver's hash sees the
# serialized type. Compare TYPE FAMILIES per column: integer widths are
# canonicalized (the driver demonstrably tolerates int32-vs-int64 —
# q19 has always hash-passed) but decimal/int, float/int, str/int
# divergence fails. An oracle needing an exception has a bug — CAST it.
_INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
              "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def type_family(t):
    t = str(t).upper()
    if t.endswith("[]"):
        return "list<" + type_family(t[:-2]) + ">"
    if t in _INT_TYPES:
        return "int"
    if t in ("FLOAT", "DOUBLE"):
        return "float"
    if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL"):
        return "decimal"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    return t


def dtype_mismatches(got_cols, got_types, want_cols, want_types):
    got = dict(zip(got_cols, [type_family(t) for t in got_types]))
    want = dict(zip(want_cols, [type_family(t) for t in want_types]))
    return [(c, got[c], want[c]) for c in sorted(set(got) & set(want))
            if got[c] != want[c]]


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
        got_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        got_cols = list(got_rel.columns)
        got_types = list(got_rel.types)
        got_rows = got_rel.fetchall()
        if name in TOLERANCE_ORACLES:
            if check_tolerance(name, TOLERANCE_ORACLES[name],
                               got_cols, got_rows, con):
                n_ok += 1
            else:
                n_bad += 1
            continue
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(got_rows)} rows "
                  f"({'OK' if got_rows else 'EMPTY!'})")
            continue
        want_rel = con.sql(oracles[name])
        want_cols = list(want_rel.columns)
        want_types = list(want_rel.types)
        want_rows = want_rel.fetchall()
        _, g = canon(got_rows, got_cols)
        _, w = canon(want_rows, want_cols)
        bad_types = dtype_mismatches(got_cols, got_types, want_cols, want_types)
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(want_cols)}")
            n_bad += 1
        elif bad_types:
            print(f"FAIL {name}: dtype families differ (col, spark, oracle): "
                  f"{bad_types}")
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
