#!/usr/bin/env python3
"""Expected parquet for the remaining pipeline-level rows-only queries,
via the proven reference-executed-dump pattern (gen_expected_parquet.py):

  - expected_level_mix.parquet (resolved_level, n_docs) for q35: which
    cascade level resolves each doc, REPLAYED THROUGH THE REFERENCE
    parser + the app.py auto acceptance predicates (app.py:154,167,180)
    over the same per-level OCR texts the pipeline consumes;
  - expected_box_stats.parquet (doc_id, n_boxes, max_conf, min_left)
    for q42: per-doc premium OCR box stats from the frozen engine dump
    (box content is engine-specific; this freezes one execution so any
    regression in box plumbing is hash-caught).

Run after FixtureDump + gen_golden.py:
    python3 fixtures/gen_pipeline_expected.py
"""
import json
import os
import sys

import duckdb

sys.path.insert(0, "/root/reference")
from parsers.tsh import premium_parse_tsh  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def parsed_ok(raw):
    """run_and_parse acceptance input (gen_golden.py / app.py:74-98)."""
    if raw is None:
        return None
    p = premium_parse_tsh(raw, [])
    return p if p.ok else None


def resolved_level(doc):
    """app.py:151-196 auto-cascade acceptance order."""
    p = parsed_ok(doc.get("light_raw"))
    if p and not (p.ref_min is None and p.ref_max is None):
        return "light"
    p = parsed_ok(doc.get("premium_raw"))
    if p and not (p.ref_min is None and p.ref_max is None):
        return "premium"
    if parsed_ok(doc.get("optimum_raw")):
        return "optimum"
    return "failed"


def main():
    docs = [json.loads(l) for l in
            open(f"{HERE}/ocr_dump.jsonl", encoding="utf-8") if l.strip()]
    con = duckdb.connect()

    mix = {}
    for d in docs:
        lv = resolved_level(d)
        mix[lv] = mix.get(lv, 0) + 1
    con.execute("CREATE TABLE mix (resolved_level VARCHAR, n_docs BIGINT)")
    con.executemany("INSERT INTO mix VALUES (?, ?)", sorted(mix.items()))
    con.execute(f"COPY mix TO '{HERE}/expected_level_mix.parquet' (FORMAT PARQUET)")
    print(f"level mix over {len(docs)} docs: {mix}")

    con.execute("""CREATE TABLE boxes (doc_id VARCHAR, n_boxes BIGINT,
        max_conf DOUBLE, min_left INTEGER)""")
    rows = []
    for d in docs:
        bs = d.get("premium_boxes") or []
        rows.append((d["doc_id"], len(bs),
                     max((b["conf"] for b in bs), default=None),
                     min((b["left"] for b in bs), default=None)))
    con.executemany("INSERT INTO boxes VALUES (?, ?, ?, ?)", rows)
    con.execute(f"COPY boxes TO '{HERE}/expected_box_stats.parquet' (FORMAT PARQUET)")
    print(f"wrote box stats for {len(rows)} docs "
          f"({sum(1 for r in rows if r[1] == 0)} box-less)")


if __name__ == "__main__":
    main()
