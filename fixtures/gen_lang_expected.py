#!/usr/bin/env python3
"""Independent mirror of the char-n-gram language classifier (q75):
re-derives the per-language trigram profiles from the DUMPED word lists
(fixtures/lang_profiles.json — written by `sbt "runMain
graft.LangProfileDump"` from the Scala source-of-truth table) and
re-scores the q75 corpus with an independent implementation. Only the
word-list DATA is shared with graft.analysis.LangId; normalization,
profile building, scoring and argmax are reimplemented here.

Mirrored semantics (lockstep with LangProfiles/LangNgramScores/LangId):
    normalize: " " + letter-runs of lower(text) joined by " " + " "
               (letters = Unicode \\p{L}; code-point coordinates)
    profile:   trigram counts over normalize(" ".join(words)),
               L2-normalized per language
    score:     sum of profile weight vectors over every doc trigram
               occurrence, in document order (dot(docCounts, profile))
    argmax:    first-declared language wins ties; all-zero -> "und"
    q75 corpus: documents + per-language synthetic docs
               (doc_id 9000000 + li*10 + rep; text = word list rotated
               by rep, doubled, space-joined; rep in 0..2)

Run after changing LangProfiles or the sf0.01 documents table:
    sbt "runMain graft.LangProfileDump fixtures/lang_profiles.json"
    python3 fixtures/gen_lang_expected.py [sfDir]

Writes fixtures/expected_langid.parquet (doc_id, lang_pred) for q75.
"""
import json
import math
import os
import sys

import duckdb
import regex

HERE = os.path.dirname(os.path.abspath(__file__))
LETTER_RUN = regex.compile(r"\p{L}+")


def normalize(text):
    # letterless text must normalize to ONE space, exactly like
    # LangProfiles.normalizeLowered (join-then-pad would emit two);
    # harmless at N=3 (neither yields trigrams) but the normal forms
    # must not drift
    runs = LETTER_RUN.findall(text.lower())
    return " " + " ".join(runs) + " " if runs else " "


def trigrams(text, n):
    norm = normalize(text)
    return [norm[i:i + n] for i in range(len(norm) - n + 1)]


def build_profiles(langs, words, n):
    """lang -> {trigram: weight}, L2-normalized."""
    profiles = []
    for lang in langs:
        counts = {}
        for g in trigrams(" ".join(words[lang]), n):
            counts[g] = counts.get(g, 0) + 1
        norm = math.sqrt(sum(c * c for c in counts.values()))
        profiles.append((lang, {g: c / norm for g, c in counts.items()}))
    return profiles


def main(sf_dir):
    with open(os.path.join(HERE, "lang_profiles.json"), encoding="utf-8") as f:
        spec = json.load(f)
    n, langs, words = spec["n"], spec["languages"], spec["words"]
    profiles = build_profiles(langs, words, n)
    # dense lookup: trigram -> per-language weight vector (langs order)
    table = {}
    for li, (_lang, prof) in enumerate(profiles):
        for g, w in prof.items():
            table.setdefault(g, [0.0] * len(langs))[li] = w

    def predict(text):
        scores = [0.0] * len(langs)
        for g in trigrams(text, n):
            w = table.get(g)
            if w is not None:
                for li in range(len(langs)):
                    scores[li] += w[li]
        best_li, best_s = 0, scores[0]
        for li in range(1, len(langs)):
            if scores[li] > best_s:
                best_li, best_s = li, scores[li]
        return langs[best_li] if max(scores) > 0.0 else "und"

    con = duckdb.connect()
    base = dict(con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') "
        "ORDER BY doc_id").fetchall())
    docs = dict(base)
    for li, lang in enumerate(langs):
        ws = words[lang]
        for rep in range(3):
            rot = ws[rep:] + ws[:rep]
            docs[9000000 + li * 10 + rep] = " ".join(rot + rot)

    rows = [(i, predict(t)) for i, t in sorted(docs.items())]
    # sanity BEFORE writing: every synthetic doc must classify as its
    # own language (guaranteed by the L2-normalized cosine argmax) — a
    # failing run must not leave a fresh plausible-looking fixture
    bad = [(i, p) for i, p in rows
           if i >= 9000000 and p != langs[(i - 9000000) // 10]]
    if bad:
        raise SystemExit(f"self-classification failed: {bad[:5]}")
    con.execute("CREATE TABLE t (doc_id BIGINT, lang_pred VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    out = os.path.join(HERE, "expected_langid.parquet")
    con.execute(f"COPY t TO '{out}' (FORMAT PARQUET)")
    print(f"wrote {len(rows):6d} rows to expected_langid.parquet")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
