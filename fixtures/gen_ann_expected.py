#!/usr/bin/env python3
"""Independent mirror of the ANN queries (q28 multi-probe sign-LSH,
q47 IVF) — both are deterministic given the embeddings table (the
hyperplanes are xxh64-derived, the centroids are a deterministic corpus
sample), so an independent Python implementation can produce expected
parquet and the driver's DuckDB compare becomes a genuine
cross-implementation check of bucketing, probing, cell assignment and
the exact-cosine rerank.

Mirrored semantics (lockstep with graft.analysis.VectorOps /
SignProjections / BroadcastDotProducts / CosineSim):
  sign-LSH: plane seed = hashInt(t*nPlanes + p, 42); component sign =
    +1 iff floorMod(hashInt(d, seed), 2) == 0; bucket bit i set iff
    projection_i >= 0; query probes = home XOR flips of the probeBits
    smallest-|projection| bits, ties by plane index;
  IVF: centroids = first nCells vectors by vec_id, unit-normalized;
    cells by max dot (ties -> lowest cell); queries probe nProbe cells;
  rerank: exact cosine (sequential IEEE sums, identical order to the
    fused CosineSim loop), rank = row_number over (cos desc, id asc).

Run: python3 fixtures/gen_ann_expected.py [sfDir]   (default sf0.01 —
the sf the driver verifies with). Writes expected_ann_lsh.parquet and
expected_ann_ivf.parquet (query_id, neighbor_id, rank).
"""
import math
import os
import sys

import duckdb

from xxh64 import hash_int, to_signed

HERE = os.path.dirname(os.path.abspath(__file__))


def sign_projections(vec, n_planes, tables):
    out = []
    for t in range(tables):
        projs = []
        for p in range(n_planes):
            seed = hash_int(t * n_planes + p, 42)
            acc = 0.0
            for d, x in enumerate(vec):
                h = to_signed(hash_int(d, seed))
                acc += x if h % 2 == 0 else -x
            projs.append(acc)
        out.append(projs)
    return out


def bucket_of(projs):
    b = 0
    for i, pr in enumerate(projs):
        if pr >= 0:
            b |= 1 << i
    return b


def lsh_keys(vec, n_planes, tables):
    return [(t, bucket_of(projs))
            for t, projs in enumerate(sign_projections(vec, n_planes, tables))]


def probe_keys(vec, n_planes, tables, probe_bits):
    keys = []
    for t, projs in enumerate(sign_projections(vec, n_planes, tables)):
        home = bucket_of(projs)
        low_idx = [i for _, i in
                   sorted((abs(pr), i) for i, pr in enumerate(projs))][:probe_bits]
        for mask in range(1 << probe_bits):
            flip = 0
            for j in range(probe_bits):
                if mask & (1 << j):
                    flip |= 1 << low_idx[j]
            keys.append((t, home ^ flip))
    return keys


def cosine(a, b):
    na = 0.0
    for x in a:
        na += x * x
    nb = 0.0
    for y in b:
        nb += y * y
    d = math.sqrt(na) * math.sqrt(nb)
    if d <= 0:
        return 0.0
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    return dot / d


def topk(cand_pairs, emb, k):
    """cand_pairs: set of (q, n). Returns [(q, n, rank)]."""
    out = []
    by_q = {}
    for q, n in cand_pairs:
        by_q.setdefault(q, []).append(n)
    for q, ns in by_q.items():
        scored = sorted(((-cosine(emb[q], emb[n]), n) for n in set(ns)))
        for rank, (_, n) in enumerate(scored[:k], start=1):
            out.append((q, n, rank))
    return sorted(out)


def ann_lsh(emb, query_ids, k, n_planes, tables, probe_bits):
    buckets = {}
    for i, v in emb.items():
        for key in lsh_keys(v, n_planes, tables):
            buckets.setdefault(key, []).append(i)
    cands = set()
    for q in query_ids:
        for key in probe_keys(emb[q], n_planes, tables, probe_bits):
            for n in buckets.get(key, []):
                if n != q:
                    cands.add((q, n))
    return topk(cands, emb, k)


def unit_norm(v):
    n = 0.0
    for x in v:
        n += x * x
    n = math.sqrt(n)
    return [x / n for x in v] if n > 0 else list(v)


def cell_keys(vec, cents, n_probe):
    dots = []
    for c in cents:
        acc = 0.0
        for x, y in zip(vec, c):
            acc += x * y
        dots.append(acc)
    return [cell for _, cell in sorted((-d, i) for i, d in enumerate(dots))][:n_probe]


def ann_ivf(emb, query_ids, k, n_cells, n_probe):
    cents = [unit_norm(emb[i]) for i in sorted(emb)[:n_cells]]
    cells = {}
    for i, v in emb.items():
        cells.setdefault(cell_keys(v, cents, 1)[0], []).append(i)
    cands = set()
    for q in query_ids:
        for cell in cell_keys(emb[q], cents, n_probe):
            for n in cells.get(cell, []):
                if n != q:
                    cands.add((q, n))
    return topk(cands, emb, k)


def main(sf_dir):
    con = duckdb.connect()
    emb = {i: [float(x) for x in v] for i, v in con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
        "ORDER BY vec_id").fetchall()}
    queries = [i for i in emb if i < 5]

    def write(name, rows):
        con.execute(f"DROP TABLE IF EXISTS t; CREATE TABLE t "
                    "(query_id BIGINT, neighbor_id BIGINT, rank INTEGER)")
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
        con.execute(f"COPY t TO '{HERE}/{name}.parquet' (FORMAT PARQUET)")
        print(f"wrote {len(rows)} rows to {name}.parquet")

    # q28: annTopK(k=3, nPlanes=8, tables=4, probeBits=3)
    write("expected_ann_lsh", ann_lsh(emb, queries, 3, 8, 4, 3))
    # q47: ivfTopK(k=3, nCells=32, nProbe=4)
    write("expected_ann_ivf", ann_ivf(emb, queries, 3, 32, 4))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
