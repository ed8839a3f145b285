#!/usr/bin/env python3
"""Golden-fixture generator (SURVEY.md §5.2, FIXTURES.md §4).

Reads fixtures/ocr_dump.jsonl (per-doc, per-level OCR output dumped by
`sbt "runMain graft.FixtureDump"` from the SAME Scala corpus + simulated
OCR the pipeline runs) and replays each document through the REFERENCE
implementation:

  - parser: /root/reference/parsers/tsh.py  premium_parse_tsh (executed,
    not reimplemented — the reference ships zero tests, so its parser IS
    the oracle, SURVEY.md §5.1)
  - mode dispatch + auto cascade: the logic of /root/reference/app.py
    _run_and_parse (app.py:74-98) and ocr_tsh (app.py:105-196),
    re-expressed below 1:1 (acceptance predicates app.py:154,167,180;
    failure passthrough app.py:133-138,192-196)

and emits fixtures/golden.json: for each (doc_id, mode) the expected
output span sequence (kind, text, media_ref, order) per SURVEY.md §1.3.

Span-emission convention (mirrored in graft.extract.SpanAssembly):
  ok:      marker, value, unit?, ref_min?, ref_max?, confidence, raw_text?
  failure: marker, error, raw_text?
order = position in the emitted sequence; only the raw_text span carries
a media_ref (the doc's first media span's ref, "" if no media).
Values are rendered with Python str(float) == Java Double.toString for
every magnitude in this domain (asserted by the ScalaTest golden suite).
"""
import json
import sys
import os

sys.path.insert(0, "/root/reference")
from parsers.tsh import premium_parse_tsh  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def run_and_parse(level_raw):
    """app.py:74-98. level_raw: raw text or None (None = OCR failed)."""
    if level_raw is None:
        return None, "OCR_FAILED", None
    parsed = premium_parse_tsh(level_raw, [])
    if not parsed.ok:
        return None, parsed.error, level_raw
    return parsed, None, level_raw


def spans_ok(parsed, raw_text, first_ref):
    out = [("marker", "TSH", ""), ("value", str(parsed.value), "")]
    if parsed.unit is not None:
        out.append(("unit", parsed.unit, ""))
    if parsed.ref_min is not None:
        out.append(("ref_min", str(parsed.ref_min), ""))
    if parsed.ref_max is not None:
        out.append(("ref_max", str(parsed.ref_max), ""))
    out.append(("confidence", parsed.confidence, ""))
    if raw_text is not None:
        out.append(("raw_text", raw_text, first_ref))
    return out


def spans_fail(error, raw_text, first_ref):
    out = [("marker", "TSH", ""), ("error", error, "")]
    if raw_text is not None:
        out.append(("raw_text", raw_text, first_ref))
    return out


def respond(doc, mode):
    first_ref = doc.get("first_media_ref", "")
    raws = {
        "light": doc.get("light_raw"),
        "premium": doc.get("premium_raw"),
        "optimum": doc.get("optimum_raw"),
    }
    if mode in ("light", "premium", "optimum"):  # app.py:131-148
        parsed, error, raw_text = run_and_parse(raws[mode])
        if not parsed:
            return spans_fail(error, raw_text, first_ref)
        return spans_ok(parsed, raw_text, first_ref)
    # auto: app.py:151-196
    parsed, error, raw_text = run_and_parse(raws["light"])
    if parsed and not (parsed.ref_min is None and parsed.ref_max is None):
        return spans_ok(parsed, raw_text, first_ref)
    parsed, error, raw_text = run_and_parse(raws["premium"])
    if parsed and not (parsed.ref_min is None and parsed.ref_max is None):
        return spans_ok(parsed, raw_text, first_ref)
    parsed, error, raw_text = run_and_parse(raws["optimum"])
    if parsed:
        return spans_ok(parsed, raw_text, first_ref)
    return spans_fail(error or "TSH_NOT_FOUND", raw_text, first_ref)


def main():
    dump = os.path.join(HERE, "ocr_dump.jsonl")
    out_path = os.path.join(HERE, "golden.json")
    golden = []
    with open(dump, encoding="utf-8") as f:
        docs = [json.loads(line) for line in f if line.strip()]
    for doc in docs:
        for mode in ("auto", "light", "premium", "optimum"):
            spans = respond(doc, mode)
            golden.append({
                "doc_id": doc["doc_id"],
                "mode": mode,
                "spans": [
                    {"kind": k, "text": t, "media_ref": r, "order": i}
                    for i, (k, t, r) in enumerate(spans)
                ],
            })
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(golden, f, ensure_ascii=False, indent=None)
    ok = sum(1 for g in golden if any(s["kind"] == "value" for s in g["spans"]))
    print(f"wrote {len(golden)} (doc, mode) fixtures to {out_path}; "
          f"{ok} ok / {len(golden) - ok} failure outcomes")


if __name__ == "__main__":
    main()
