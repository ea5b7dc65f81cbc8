#!/usr/bin/env python3
"""Dev-time golden generator for the q77 DSIR importance-resampling oracle.

Fully independent Python re-derivation of text.Dsir's contract (no JVM, no
shared code) — DSIR, Xie et al. 2023 (arXiv:2302.03169):

  - target model = hashed-feature occurrence counts over the EVEN-doc_id
    half of the documents corpus; raw model = the ODD half;
  - features per document: word unigrams (CPython str.split tokens) then
    adjacent-pair bigrams space-joined (tokens carry no whitespace, so the
    join is collision-free);
  - bucket(feat) = signed_xxh64(utf8(feat), seed 42) mod 4096 — the
    public-spec XXH64 replication below is shared verbatim with
    tools/gen_pairs_golden.py (proved bit-exact vs Spark's xxhash64 by the
    q16/q31 oracles); Python's % already returns the floored (non-negative)
    residue that Spark's pmod computes;
  - per-bucket weight lam(f) = micro((c_t+1)/(N_t+4096)) -
    micro((c_r+1)/(N_r+4096)) with the canonical micro-nat quantizer
    micro(p) = floor(log(p) * 1e6 + 0.5)  (CPython math.log == Java
    Math.log within the quantizer margin — the q69 argument);
  - per-document weight = plain integer sum of lam over feature
    OCCURRENCES (order-exact: integer addition is associative).

Output parquet: (doc_id, n_feats, weight_micro) for ALL documents.

With --gumbel (the q82 oracle): additionally derive the seeded Gumbel
perturbation (seed 7) —
    u = ((xxh64(little_endian_int64(doc_id), 7) >> 11) + 0.5) * 2**-53
    gumbel_micro = floor(-log(-log(u)) * 1e6 + 0.5)
(strictly interior u; two lns quantized ONCE — the micro-nat 1-ulp
argument) and write (doc_id, weight_micro, gumbel_micro) to
src/test/resources/golden/dsir_gumbel_sf001.parquet.

Usage: python3 tools/gen_dsir_golden.py [--gumbel] [documents_parquet] [out_parquet]
"""
import math
import struct
import sys

import duckdb

GUMBEL = "--gumbel" in sys.argv
_pos = [a for a in sys.argv[1:] if a != "--gumbel"]
DOCS = (_pos[0] if len(_pos) > 0
        else "/root/testdata/sf0.01/documents.parquet")
OUT = (_pos[1] if len(_pos) > 1
       else ("src/test/resources/golden/dsir_gumbel_sf001.parquet" if GUMBEL
             else "src/test/resources/golden/dsir_sf001.parquet"))

B = 4096
M64 = (1 << 64) - 1

# -- XXH64 (public spec, seed 42 = Spark xxhash64 default) -------------------
# (implementation shared verbatim with tools/gen_pairs_golden.py — the
# q16/q31 oracles' bit-exact replication of Spark's xxhash64)

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


def s64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def bucket(feat: str) -> int:
    return s64(xxh64(feat.encode("utf-8"))) % B


def doc_buckets(text: str):
    ws = text.split()
    for w in ws:
        yield bucket(w)
    for a, b in zip(ws, ws[1:]):
        yield bucket(a + " " + b)


def micro(p: float) -> int:
    return math.floor(math.log(p) * 1e6 + 0.5)


def main():
    rows = duckdb.sql(
        f"SELECT doc_id, coalesce(text, '') FROM read_parquet('{DOCS}') "
        "ORDER BY doc_id").fetchall()
    assert len(rows) >= 100, f"suspiciously small corpus: {len(rows)}"

    c_t = [0] * B
    c_r = [0] * B
    for doc_id, t in rows:
        counts = c_t if doc_id % 2 == 0 else c_r
        for f in doc_buckets(t):
            counts[f] += 1
    n_t = float(sum(c_t))
    n_r = float(sum(c_r))
    lam = [micro((c_t[f] + 1.0) / (n_t + float(B))) -
           micro((c_r[f] + 1.0) / (n_r + float(B))) for f in range(B)]

    out = []
    for doc_id, t in rows:
        s = 0
        n = 0
        for f in doc_buckets(t):
            s += lam[f]
            n += 1
        out.append((doc_id, n, s))

    con = duckdb.connect()
    if GUMBEL:
        def gmicro(doc_id: int) -> int:
            h = xxh64(struct.pack("<q", doc_id), 7)
            u = ((h >> 11) + 0.5) * 2.0 ** -53
            return math.floor(-math.log(-math.log(u)) * 1e6 + 0.5)
        rows_g = [(doc_id, w, gmicro(doc_id)) for doc_id, _, w in out]
        con.execute("CREATE TABLE g (doc_id BIGINT, weight_micro BIGINT, "
                    "gumbel_micro BIGINT)")
        con.executemany("INSERT INTO g VALUES (?, ?, ?)", rows_g)
        con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
        print(f"wrote {len(rows_g)} gumbel rows -> {OUT}  "
              f"(sum_g={sum(r[2] for r in rows_g)})")
        return
    con.execute(
        "CREATE TABLE g (doc_id BIGINT, n_feats BIGINT, weight_micro BIGINT)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?)", out)
    con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
    print(f"wrote {len(out)} rows -> {OUT}  "
          f"(N_t={int(n_t)}, N_r={int(n_r)}, "
          f"sum_w={sum(r[2] for r in out)})")


if __name__ == "__main__":
    main()
