#!/usr/bin/env python3
"""Dev-time golden generator for the q17 SimHash oracle.

Independent (non-JVM) re-derivation of the engine's 64-bit SimHash spec
(graft.dedup.SimHash.simhash: Shingles.canonical -> word unigrams +
bigrams, each hashed with Shingles.hashRange (per-char splitmix64 folding,
seed 11) -> per-bit vote -> sign bit), over the testdata documents,
committed as (doc_id, simhash64) parquet the DuckDB oracle reads. All
arithmetic replicates Java two's-complement longs.

Usage: python3 tools/gen_simhash_golden.py [sf_dir] [out_parquet]
"""
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/golden/simhash_sf001.parquet")

M64 = (1 << 64) - 1
SEED = 11


def s64(x: int) -> int:
    return ((x & M64) + (1 << 63)) % (1 << 64) - (1 << 63)


def mix64_u(z: int) -> int:
    """splitmix64 finalizer, unsigned-64 domain."""
    z = (z + 0x9E3779B97F4A7C15) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return z ^ (z >> 31)


def hash_range_u(s: str, seed: int) -> int:
    """Shingles.hashRange over the whole string (unsigned-64 domain).
    Java: h = seed ^ 0x9e3779b97f4a7c15; per char h = mix64(h ^ c)."""
    h = (seed ^ 0x9E3779B97F4A7C15) & M64
    for c in s:
        h = mix64_u(h ^ ord(c))
    return h


def canonical(t: str) -> str:
    assert all(ord(c) < 128 for c in t), "non-ASCII corpus: extend canonical()"
    out, prev_space = [], True
    for c in t.lower():
        if c.isalnum():
            out.append(c)
            prev_space = False
        elif not prev_space:
            out.append(" ")
            prev_space = True
    return "".join(out).strip()


def simhash(text: str) -> int:
    words = [w for w in canonical(text).split(" ") if w]
    if not words:
        return 0
    acc = [0] * 64
    def add(h: int) -> None:
        for b in range(64):
            if (h >> b) & 1:
                acc[b] += 1
            else:
                acc[b] -= 1
    for i, w in enumerate(words):
        h1 = mix64_u(SEED ^ hash_range_u(w, SEED))
        add(h1)
        if i + 1 < len(words):
            h2 = mix64_u(h1 ^ hash_range_u(words[i + 1], SEED))
            add(h2)
    sig = 0
    for b in range(64):
        if acc[b] > 0:
            sig |= 1 << b
    return s64(sig)


con = duckdb.connect()
rows = con.execute(
    f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
).fetchall()
golden = [(doc_id, simhash(text or "")) for doc_id, text in rows]
con.execute("CREATE TABLE g (doc_id BIGINT, simhash64 BIGINT)")
con.executemany("INSERT INTO g VALUES (?, ?)", golden)
con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
print(f"wrote {len(golden)} golden simhash signatures to {OUT}")
