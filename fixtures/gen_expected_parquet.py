#!/usr/bin/env python3
"""Materialize the auto-mode golden fixtures (reference-executed, see
gen_golden.py) as a parquet of exploded span rows so the driver's DuckDB
oracle can hash-compare the FLAGSHIP pipeline query (q24_tsh_auto)
instead of recording a weaker rows-only check.

Run after gen_golden.py:  python3 fixtures/gen_expected_parquet.py
Writes fixtures/expected_auto_spans.parquet with columns
(doc_id, kind, text, media_ref, "order") matching Pipeline.extractRows.
"""
import json
import os

import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    golden = json.load(open(f"{HERE}/golden.json"))
    rows = [
        (e["doc_id"], s["kind"], s["text"], s["media_ref"], s["order"])
        for e in golden if e["mode"] == "auto"
        for s in e["spans"]
    ]
    con = duckdb.connect()
    con.execute("""CREATE TABLE t (doc_id VARCHAR, kind VARCHAR,
        text VARCHAR, media_ref VARCHAR, "order" INTEGER)""")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?, ?)", rows)
    out = f"{HERE}/expected_auto_spans.parquet"
    con.execute(f"COPY t TO '{out}' (FORMAT PARQUET)")
    print(f"wrote {len(rows)} span rows "
          f"({sum(1 for e in golden if e['mode'] == 'auto')} docs) to {out}")

    # q41: confidence/error class counts over the same auto spans (the
    # map-typed-column query reduces to exactly this aggregation)
    counts = {}
    for (_, kind, text, _, _) in rows:
        if kind in ("confidence", "error"):
            counts[(kind, text)] = counts.get((kind, text), 0) + 1
    con.execute("CREATE TABLE c (kind VARCHAR, text VARCHAR, n BIGINT)")
    con.executemany("INSERT INTO c VALUES (?, ?, ?)",
                    [(k, t, n) for (k, t), n in sorted(counts.items())])
    out_c = f"{HERE}/expected_span_class_counts.parquet"
    con.execute(f"COPY c TO '{out_c}' (FORMAT PARQUET)")
    print(f"wrote {len(counts)} class-count rows to {out_c}")


if __name__ == "__main__":
    main()
