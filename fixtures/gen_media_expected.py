#!/usr/bin/env python3
"""Independent Python re-implementation of the StubCodec semantics
(src/main/scala/graft/media/BinaryOps.scala — decode metadata and the
frame-sampling count) over the dumped asset payloads, producing the q34
DuckDB oracle. Converts q34 from a rows-only check into a genuine
cross-implementation check of the codec semantics plus the Spark-side
decode -> frame-count -> join pipeline.

Inputs: fixtures/assets_dump.jsonl (from `sbt "runMain graft.MediaDump
fixtures/assets_dump.jsonl 2000"` — regenerate after ANY corpus or
assetsFor change). Writes fixtures/expected_media.parquet with q34's
exact schema: (media_ref, mime, n_bytes, width, height, n_frames, ok,
n_sampled_frames).

Mirrored semantics (the constants here ARE the spec — change BOTH this
file and StubCodec or neither):
    h(bytes, salt): acc = 1125899906842597 ^ salt;
                    acc = acc * 31 + signed_byte (64-bit wraparound);
                    result = acc & 0x7fffffff
    width  = 320 + h(bytes, 1) % 1600
    height = 240 + h(bytes, 2) % 1200
    n_frames = 1 + h(bytes, 3) % 120 for video/*, else 1
    ok = len(bytes) > 0
    n_sampled_frames = min(4, n_frames)   (sampleFrames maxFrames=4)
"""
import base64
import json
import os

import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))
MASK64 = (1 << 64) - 1


def h(data: bytes, salt: int) -> int:
    acc = (1125899906842597 ^ salt) & MASK64
    for byte in data:
        b = byte - 256 if byte > 127 else byte  # Java bytes are signed
        acc = (acc * 31 + b) % (1 << 64)
    return acc & 0x7FFFFFFF


# ---- dHash mirror (q66) ----------------------------------------------
# Mirrors StubCodec.resize (nearest-neighbor byte resample, target
# snapped DOWN to a multiple of the 72-pixel raster when >= 72),
# StubCodec.grayFrame (nearest-neighbor unsigned-byte sample onto the
# 9x8 raster, frame 0), DHash64 (bit y*8+x set iff right neighbor
# strictly brighter) and TextOps.bandedHammingPairs (8 bands x 8 bits,
# hamming <= 7, pairs share any band, id_a < id_b).
def stub_resize(content: bytes, w: int, hh: int) -> bytes:
    n0 = max(8, min(len(content), (w * hh) // 256))
    n = (n0 // 72) * 72 if n0 >= 72 else n0
    if not content:
        return bytes(n)
    return bytes(content[(i * len(content)) // n] for i in range(n))


def gray_frame(content: bytes, frame_idx: int = 0) -> list:
    if not content:
        return [0] * 72
    return [content[((p * len(content)) // 72 + frame_idx * 7) % len(content)]
            for p in range(72)]


def dhash64(gray: list) -> int:
    u = 0
    for y in range(8):
        for x in range(8):
            if gray[y * 9 + x + 1] > gray[y * 9 + x]:
                u |= 1 << (y * 8 + x)
    return u


def dhash_pairs(hashes: dict, bands=8, max_hamming=7):
    """hashes: {id: unsigned 64-bit dhash}. [(id_a, id_b, hamming)]."""
    buckets = {}
    for i in hashes:
        for b in range(bands):
            key = (b, (hashes[i] >> (b * 8)) & 0xFF)
            buckets.setdefault(key, []).append(i)
    pairs = set()
    for members in buckets.values():
        members.sort()
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                pairs.add((members[x], members[y]))
    out = []
    for a, b in sorted(pairs):
        hd = bin(hashes[a] ^ hashes[b]).count("1")
        if hd <= max_hamming:
            out.append((a, b, hd))
    return out


def main():
    rows = []
    images = {}
    with open(f"{HERE}/assets_dump.jsonl") as f:
        for line in f:
            a = json.loads(line)
            content = base64.b64decode(a["content"])
            mime = a["mime"]
            n_frames = (1 + h(content, 3) % 120
                        if mime.startswith("video/") else 1)
            rows.append((
                a["media_ref"], mime, len(content),
                320 + h(content, 1) % 1600, 240 + h(content, 2) % 1200,
                n_frames, len(content) > 0, min(4, n_frames)))
            if mime.startswith("image/") and len(content) >= 72:
                images[a["media_ref"]] = content
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (media_ref VARCHAR, mime VARCHAR, n_bytes INTEGER, "
        "width INTEGER, height INTEGER, n_frames INTEGER, ok BOOLEAN, "
        "n_sampled_frames BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?, ?, ?, ?, ?)", rows)
    out = f"{HERE}/expected_media.parquet"
    con.execute(f"COPY t TO '{out}' (FORMAT PARQUET)")
    print(f"wrote {len(rows):6d} rows to expected_media.parquet")

    # q66: images + resized (~r, maxSide 192) + noisy (~n, every byte
    # XOR 1) copies; one frame (#0) per image asset
    hashes = {}
    for ref, content in images.items():
        hashes[ref + "#0"] = dhash64(gray_frame(content))
        hashes[ref + "~r#0"] = dhash64(gray_frame(stub_resize(content, 192, 192)))
        hashes[ref + "~n#0"] = dhash64(gray_frame(bytes(b ^ 1 for b in content)))
    dd = dhash_pairs(hashes)
    con.execute("CREATE TABLE d (id_a VARCHAR, id_b VARCHAR, hamming INTEGER)")
    con.executemany("INSERT INTO d VALUES (?, ?, ?)", dd)
    con.execute(f"COPY d TO '{HERE}/expected_media_dedup.parquet' (FORMAT PARQUET)")
    print(f"wrote {len(dd):6d} rows to expected_media_dedup.parquet")


if __name__ == "__main__":
    main()
