"""Pure-Python XXH64, bit-compatible with Spark's
`org.apache.spark.sql.catalyst.expressions.XXH64` — the independent
implementation behind the hash-query oracles (expected parquet for
q25/q26/q27/q45/q48 is produced HERE, not by Spark, so the driver's
DuckDB compare is a genuine cross-implementation check).

Spark semantics replicated:
  - xxhash64(a, b, ...) starts at seed 42 and folds each argument with
    the running hash as the seed; NULL arguments are skipped;
  - an int argument hashes its 4 little-endian bytes, a long its 8,
    a string its UTF-8 bytes (XxHash64Function / XXH64.hash*).

The algorithm is the public XXH64 spec (Yann Collet, BSD); this file
implements it from the spec, ~60 lines.
"""

MASK = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & MASK


def _round(acc, inp):
    return (_rotl((acc + inp * P2) & MASK, 31) * P1) & MASK


def _fmix(h):
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """Canonical XXH64 of a byte string (unsigned 64-bit result)."""
    seed &= MASK
    n = len(data)
    i = 0
    if n >= 32:
        v1, v2, v3 = (seed + P1 + P2) & MASK, (seed + P2) & MASK, seed
        v4 = (seed - P1) & MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * P1 + P4) & MASK
    else:
        h = (seed + P5) & MASK
    h = (h + n) & MASK
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & MASK
        h = (_rotl(h, 23) * P2 + P3) & MASK
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        i += 1
    return _fmix(h)


def hash_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong: the long's 8 LE bytes."""
    return xxh64((value & MASK).to_bytes(8, "little"), seed)


def hash_int(value: int, seed: int) -> int:
    """Spark XXH64.hashInt: the int's 4 LE bytes."""
    return xxh64((value & 0xFFFFFFFF).to_bytes(4, "little"), seed)


def hash_utf8(s: str, seed: int) -> int:
    """Spark XXH64.hashUnsafeBytes over a UTF8String."""
    return xxh64(s.encode("utf-8"), seed)


def to_signed(v: int) -> int:
    """Unsigned 64-bit -> Java long (two's complement)."""
    return v - (1 << 64) if v >= (1 << 63) else v


def spark_xxhash64(*args) -> int:
    """Spark's `xxhash64(args...)` (signed): seed 42, fold each argument
    with the running hash as seed; None args are skipped; int args must
    be passed as ('int', v) tuples, plain Python ints hash as longs.
    """
    h = 42
    for a in args:
        if a is None:
            continue
        if isinstance(a, tuple) and a[0] == "int":
            h = hash_int(a[1], h)
        elif isinstance(a, int):
            h = hash_long(a, h)
        elif isinstance(a, str):
            h = hash_utf8(a, h)
        else:
            raise TypeError(f"unsupported xxhash64 arg type: {type(a)}")
    return to_signed(h)
