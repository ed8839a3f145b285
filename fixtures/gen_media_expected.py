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


def main():
    rows = []
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
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (media_ref VARCHAR, mime VARCHAR, n_bytes INTEGER, "
        "width INTEGER, height INTEGER, n_frames INTEGER, ok BOOLEAN, "
        "n_sampled_frames BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?, ?, ?, ?, ?)", rows)
    out = f"{HERE}/expected_media.parquet"
    con.execute(f"COPY t TO '{out}' (FORMAT PARQUET)")
    print(f"wrote {len(rows):6d} rows to expected_media.parquet")


if __name__ == "__main__":
    main()
