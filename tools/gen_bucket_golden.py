#!/usr/bin/env python3
"""Dev-time golden generator for the q31 lineage oracle.

Independent (non-JVM) re-derivation of the conversation→bucket assignment
CheckpointedRun uses: standard XXH64 (public-domain spec, seed 42 — the
Spark `xxhash64` default) over the conv_id's UTF-8 bytes, then
pmod(hash, 16). conv_ids come from the committed per-turn golden
(turns_sf001_golden.parquet), so the q31 oracle can aggregate rows/kept
per bucket fully outside Spark: bucket from THIS file, keep labels from
the sequential-spec evaluator's golden.

Usage: python3 tools/gen_bucket_golden.py [turns_golden] [out_parquet]
"""
import sys

import duckdb

TURNS = (sys.argv[1] if len(sys.argv) > 1
         else "src/test/resources/golden/turns_sf001_golden.parquet")
OUT = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/golden/buckets_sf001.parquet")

M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M64


def _round(acc: int, k: int) -> int:
    acc = (acc + k * P2) & M64
    return (rotl(acc, 31) * P1) & M64


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * P1 + P4) & M64


def xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M64
        v2 = (seed + P2) & M64
        v3 = seed & M64
        v4 = (seed - P1) & M64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M64
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (rotl(h, 27) * P1 + P4) & M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & M64
        h = (rotl(h, 23) * P2 + P3) & M64
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M64
        h = (rotl(h, 11) * P1) & M64
        i += 1
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def bucket_of(conv_id: str, n_buckets: int = 16) -> int:
    h = xxh64(conv_id.encode("utf-8"))
    signed = h - (1 << 64) if h >= (1 << 63) else h
    return signed % n_buckets  # Python % is already pmod for positive n


con = duckdb.connect()
convs = [r[0] for r in con.execute(
    f"SELECT DISTINCT conv_id FROM '{TURNS}' ORDER BY conv_id").fetchall()]
golden = [(c, bucket_of(c)) for c in convs]
con.execute("CREATE TABLE g (conv_id VARCHAR, bucket INTEGER)")
con.executemany("INSERT INTO g VALUES (?, ?)", golden)
con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
n_buckets = len(set(b for _, b in golden))
print(f"wrote {len(golden)} conv buckets ({n_buckets} distinct) to {OUT}")
