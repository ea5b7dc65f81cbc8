#!/usr/bin/env python3
"""Dev-time golden generator for the q24 winnowing-fingerprint oracle.

Independent (non-JVM) re-derivation of the engine's winnowing spec
(graft.text.Fingerprint: Shingles.canonical -> Rabin-Karp base 1000003
rolling k-gram hash over UTF-16 code units with 64-bit wraparound ->
splitmix64 finalizer -> sliding-window-w minima, distinct, sorted) over the
testdata documents, committed as (doc_id, n_fingerprints, min_fp) parquet
the DuckDB oracle reads. All arithmetic replicates Java two's-complement
longs; comparisons are SIGNED like Scala's.

Usage: python3 tools/gen_winnow_golden.py [sf_dir] [out_parquet]
"""
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/golden/winnow_sf001.parquet")

M64 = (1 << 64) - 1
K, W, B = 5, 4, 1000003


def s64(x: int) -> int:
    return ((x & M64) + (1 << 63)) % (1 << 64) - (1 << 63)


def mix64(z0: int) -> int:
    z = (z0 + 0x9E3779B97F4A7C15) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return s64(z ^ (z >> 31))


def jhash32(s: str) -> int:
    """Java String.hashCode (32-bit wraparound, signed)."""
    h = 0
    for c in s:
        h = (31 * h + ord(c)) & 0xFFFFFFFF
    return h - (1 << 32) if h >= (1 << 31) else h


def canonical(t: str) -> str:
    # lowercase, collapse non-alnum runs to one space, strip (ASCII corpus —
    # Java isLetterOrDigit/toLowerCase agree with Python on this subset)
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


def rolling_hashes(text: str) -> list:
    t = canonical(text)
    if len(t) < K:
        return [] if not t else [mix64(jhash32(t) & M64)]
    powk = pow(B, K - 1, 1 << 64)
    out = []
    h = 0
    for i in range(K):
        h = (h * B + ord(t[i])) & M64
    out.append(mix64(h))
    for i in range(K, len(t)):
        h = ((h - ord(t[i - K]) * powk) * B + ord(t[i])) & M64
        out.append(mix64(h))
    return out


def winnow(text: str) -> list:
    hs = rolling_hashes(text)
    if not hs:
        return []
    if len(hs) <= W:
        return [min(hs)]
    picked = set()
    for i in range(W - 1, len(hs)):
        picked.add(min(hs[i - W + 1:i + 1]))
    return sorted(picked)


con = duckdb.connect()
rows = con.execute(
    f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
).fetchall()
golden = []
for doc_id, text in rows:
    fp = winnow(text or "")
    assert fp, f"doc {doc_id}: empty fingerprint set (nullable min_fp) — " \
               "extend the generator's null handling before committing"
    golden.append((doc_id, len(fp), fp[0]))
con.execute("CREATE TABLE g (doc_id BIGINT, n_fingerprints INTEGER, min_fp BIGINT)")
con.executemany("INSERT INTO g VALUES (?, ?, ?)", golden)
con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
print(f"wrote {len(golden)} golden winnow fingerprints to {OUT}")
