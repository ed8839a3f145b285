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


if __name__ == "__main__":
    main()
