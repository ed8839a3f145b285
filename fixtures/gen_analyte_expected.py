#!/usr/bin/env python3
"""Independent Python implementation of the GENERIC analyte + date
extraction semantics (the engine's extension beyond the reference's
TSH-only scope, documented in AnalyteExtract.scala):

  label match on a normalized line -> snippet after label -> FIRST
  number -> to_float -> unit in a 25-char window after the value ->
  range searched after the value -> best by (has_range, penalty,
  span_start, line_no);
  date = first dd/MM/yyyy anywhere in the raw text -> ISO yyyy-MM-dd.

The number/float/range helpers are IMPORTED from the reference parser
(/root/reference/parsers/tsh.py) — the same helpers the Scala chain is
line-oracle-proven equal to — so this cross-check shares zero code with
the Scala implementation but exact semantics with the reference.

Reads fixtures/ocr_dump.jsonl; writes fixtures/expected_analytes.parquet
and fixtures/expected_dates.parquet for the q43/q44 DuckDB oracles.
Run after FixtureDump:  python3 fixtures/gen_analyte_expected.py
"""
import json
import os
import re
import sys

import duckdb

sys.path.insert(0, "/root/reference")
from parsers.tsh import NUM_RE, RANGE_RE, _adjust_ref_value, _to_float  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))

CONFIGS = [
    ("glycemia", r"glyc[ée]mie", r"(?:g ?/?L|mmol/?L)"),
    ("hemoglobin", r"h[ée]moglobine", r"g ?/?dL"),
    ("creatinine", r"cr[ée]atinine", r"µ?mol/?L"),
    ("cholesterol", r"cholest[ée]rol", r"g ?/?L"),
]

# shape-validated like graft.extract.AnalyteExtract.DateRe: day 1-31,
# month 1-12 (a looser month class would accept 13-19 and 00)
DATE_RE = re.compile(r"\b(0?[1-9]|[12]\d|3[01])/(0?[1-9]|1[0-2])/(20\d\d)\b")


def normalize(text):
    """N1 (`parsers/tsh.py:37-44`)."""
    t = (text or "").replace("\r", "\n")
    t = re.sub(r"[ \t\f\x0b]+", " ", t)
    return re.sub(r"\n+", "\n", t)


def penalty(label):
    l = label.lower()
    if "fallback" in l:
        return 2
    if "tsh" in l:
        return 0
    if "thyr" in l:
        return 1
    return 3


def candidates(raw, label_re, unit_re):
    out = []
    for line_no, line in enumerate(normalize(raw).split("\n")):
        lm = label_re.search(line)
        if not lm:
            continue
        snippet = line[lm.end():]
        nm = NUM_RE.search(snippet)
        if not nm:
            continue
        value = _to_float(nm.group(0))
        if value is None:
            continue
        after = snippet[nm.end():]
        um = unit_re.search(after[:25])
        unit = um.group(0) if um else None
        rm = RANGE_RE.search(after)
        ref_min = _adjust_ref_value(rm.group(1)) if rm else None
        ref_max = _adjust_ref_value(rm.group(2)) if rm else None
        has_range = 0 if (ref_min is not None and ref_max is not None) else 1
        out.append((has_range, penalty(lm.group(0)), lm.start(), line_no,
                    value, unit, ref_min, ref_max))
    return out


def main():
    docs = [json.loads(l) for l in open(f"{HERE}/ocr_dump.jsonl")]
    ana_rows, date_rows = [], []
    for d in docs:
        opt = d.get("optimum_raw")
        for name, lab, unit in CONFIGS:
            cs = candidates(opt, re.compile(lab, re.IGNORECASE),
                            re.compile(unit, re.IGNORECASE))
            if cs:
                best = min(cs)  # (has_range, penalty, span_start, line_no, ...)
                ana_rows.append((d["doc_id"], name) + best[4:])
        def iso(raw):
            m = DATE_RE.search(raw or "")
            return (f"{m.group(3)}-{int(m.group(2)):02d}-{int(m.group(1)):02d}"
                    if m else None)
        date_rows.append((d["doc_id"], iso(opt), iso(d.get("light_raw"))))

    con = duckdb.connect()
    con.execute("""CREATE TABLE a (doc_id VARCHAR, analyte VARCHAR,
        value DOUBLE, unit VARCHAR, ref_min DOUBLE, ref_max DOUBLE)""")
    con.executemany("INSERT INTO a VALUES (?,?,?,?,?,?)", ana_rows)
    con.execute(f"COPY a TO '{HERE}/expected_analytes.parquet' (FORMAT PARQUET)")
    con.execute("""CREATE TABLE d (doc_id VARCHAR, report_date VARCHAR,
        light_date VARCHAR)""")
    con.executemany("INSERT INTO d VALUES (?,?,?)", date_rows)
    con.execute(f"COPY d TO '{HERE}/expected_dates.parquet' (FORMAT PARQUET)")
    print(f"wrote {len(ana_rows)} analyte rows, {len(date_rows)} date rows")


if __name__ == "__main__":
    main()
