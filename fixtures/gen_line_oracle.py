#!/usr/bin/env python3
"""Line-level oracle: feed ~50 surgically crafted single-line documents
through the REFERENCE parser (`/root/reference/parsers/tsh.py`,
executed) and record the ParsedTSH fields. Covers every unit variant,
every range separator, window-boundary edges (quirk Q10), word-boundary
edges (`TSH us\\b`), case folding of accented labels, NBSP behavior,
and the fallback gate asymmetry (Q6) — sharper edges than the corpus
families hit. Writes fixtures/line_oracle.json for LineOracleSpec.
"""
import json
import os
import sys

sys.path.insert(0, "/root/reference")
from parsers.tsh import premium_parse_tsh  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))

LINES = [
    # basic + units (labelled path, tsh.py:157-161)
    "TSH 2,35 mUI/L (0,27 - 4,20)",
    "TSH 2,35mUI/L",
    "TSH 1,1 m UI/L",
    "TSH 1,2 µUI/L",
    "TSH 1,3 µ UI/L",
    "TSH 1,4 uUI/mL",
    "TSH 1,5 u UI/mL",
    "TSH 1,6 mIU/L",
    "TSH 1,7 mU/L",
    "TSH 1,8 pUI/mL",
    "TSH 1,9 UI/L",
    "TSH 2,0 mUI",
    "TSH 2,1 µUI",
    "TSH 2,2 uUI",
    # range separators (tsh.py:120-124, quirk Q4)
    "TSH 1 2 - 3", "TSH 1 2 – 3", "TSH 1 2 — 3", "TSH 1 2 ~ 3",
    "TSH 1 2 à 3", "TSH 1 2 a 3", "TSH 1 2 to 3", "TSH 1 2 & 3",
    "TSH 1 2 A 3",  # separator is case-sensitive: no range
    # unit window boundary (quirk Q10: 25 chars after value end)
    "TSH 1 " + "x" * 18 + " mUI/L",   # unit inside the window
    "TSH 1 " + "x" * 24 + " mUI/L",   # unit starts beyond 25 -> None
    # first-number / ranges interplay
    "TSH 2,35 mUI/L 0,27-4,20 puis 5,0 - 6,0",
    "TSH -0,5",
    "TSH +2,5 mUI/L (+0,3 - +4,2)",
    "TSH 1,2,3",
    # label variants / boundaries
    "T S H 3,2",
    "T.S.H. 3,3",
    "tsh 0,5",
    "TSHus 2,2",
    "TSHusine 2,2",      # us\b fails AND TSH\b fails (no boundary)
    "TSH3 1,0",          # \b between H and 3? both word chars -> no match
    "Thyréostimuline 2",
    "THYRÉOSTIMULINE 2,5",  # needs full-Unicode case folding
    "thyrotropine2,3",
    "TSH 3eme generation 2,35 mUI/L (0,27 - 4,20)",  # quirk Q3
    "TSH 3ème génération 2,35 mUI/L (0,27 - 4,20)",
    "TSH ultra  sensible 0,91",
    # N4 repair shapes on ref bounds (quirk Q5)
    "TSH 2 027 - 494",
    "TSH 2 4000 - 12345",
    "TSH 2 0,40 - 4,0",
    "TSH 2 -027 - 494",   # sign dropped by digit-join
    # NBSP: not collapsed by N1, splits the number
    "TSH 4 000,5 mUI/L",
    # fallback path (no label; tsh.py:189-239)
    "resultat 2,4 mUI",
    "x 1,1 uUI/mL 2 a 3",
    "val 3 pUI/mL",       # Q6: gate misses pUI/mL -> TSH_NOT_FOUND
    "..... 3,2 UI/L",
    "a 1 b 2 c 3 mUI 4 - 5",  # LAST number before unit (Q8)
    "mUI 3",              # no number before unit -> no candidate
    # negatives
    "Cholestérol 1,9 g/L",
    "TSH",
    "",
]


def main():
    out = []
    for line in LINES:
        p = premium_parse_tsh(line, [])
        out.append({
            "line": line, "ok": p.ok, "value": p.value, "unit": p.unit,
            "ref_min": p.ref_min, "ref_max": p.ref_max,
            "confidence": p.confidence if p.ok else None, "error": p.error,
        })
    path = os.path.join(HERE, "line_oracle.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, ensure_ascii=False, indent=1)
    print(f"wrote {len(out)} line oracles to {path}; "
          f"{sum(1 for o in out if o['ok'])} ok")


if __name__ == "__main__":
    main()
