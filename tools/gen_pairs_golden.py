#!/usr/bin/env python3
"""Dev-time golden generator for the q16 (MinHash-LSH) and q18 (SimHash)
near-duplicate PAIR-LIST oracles.

Independent (non-JVM) re-derivation of both candidate-generation pipelines
from their public specs, over the corpus dumped by
`sbt "Test/runMain graft.GoldenPairCorpus"`:

  q16: char-5-shingles -> one-permutation MinHash (128 slots, rotation
       densification; Li/Owen/Zhang NIPS'12 + Shrivastava/Li ICML'14) ->
       16 band hashes -> buckets capped at the 64 (signed-)lowest ids ->
       pair emitted only in the FIRST band both members collide in ->
       exact char-shingle Jaccard >= 0.8, rounded half-up to 6 dp.
  q18: word unigram+bigram 64-bit SimHash (Charikar) -> 4 x 16-bit blocks
       (Manku WWW'07) -> buckets capped at the 256 lowest ids -> pair
       emitted in the first AGREEING block, Hamming <= 3.

All arithmetic replicates Java two's-complement longs (splitmix64 in the
unsigned-64 domain, SIGNED comparisons where the JVM compares longs). The
corpus ids are additionally re-verified as XXH64(text, seed=42) — the same
independent implementation gen_bucket_golden.py uses — so the whole chain
from text to pair list is re-derived outside the JVM.

Scope guards: the corpus is ASCII plus a handful of BMP Greek/Cyrillic/
Latin-1 LETTERS; for those, Python's per-code-point iteration, lower() and
isalnum() coincide with Java's charAt/toLowerCase(ROOT)/isLetterOrDigit.
Loud assertions reject anything outside that envelope (capital sigma,
multi-char lowercasing, non-letter non-ASCII).

Usage (after the corpus dump):
  python3 tools/gen_pairs_golden.py [corpus_parquet] [out_dir]
"""
import sys
import unicodedata
from decimal import Decimal, ROUND_HALF_UP

import duckdb

CORPUS = (sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_pair_corpus.parquet")
OUT_DIR = (sys.argv[2] if len(sys.argv) > 2 else "src/test/resources/golden")

M64 = (1 << 64) - 1
LONG_MAX = (1 << 63) - 1


def s64(x: int) -> int:
    x &= M64
    return x - (1 << 64) if x >= (1 << 63) else x


def mix64(z: int) -> int:
    """graft.gen.TranscriptGen.mix64 (splitmix64 finalizer), unsigned domain."""
    z = (z + 0x9E3779B97F4A7C15) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return z ^ (z >> 31)


def hash_range(s: str, seed: int) -> int:
    """Shingles.hashRange over the whole string, unsigned domain.
    Java: h = seed ^ 0x9e3779b97f4a7c15; per char h = mix64(h ^ charAt)."""
    h = (seed ^ 0x9E3779B97F4A7C15) & M64
    for c in s:
        h = mix64(h ^ ord(c))
    return h


def guard_char(c: str) -> None:
    if ord(c) < 128:
        return
    assert ord(c) < 0x10000, f"non-BMP char {c!r}: Java charAt diverges"
    assert c != "Σ", "capital sigma: Java final-sigma lowering diverges"
    assert len(c.lower()) == 1, f"{c!r}: multi-char lowercase diverges"
    assert unicodedata.category(c) in ("Lu", "Ll"), (
        f"{c!r}: only plain letters are in the checked Java/Python envelope")


def canonical(t: str) -> str:
    """Shingles.canonical: lowercase (ROOT), collapse non-alnum runs to one
    space, trim."""
    for c in t:
        guard_char(c)
    out, prev_space = [], True
    for c in t.lower():
        if c.isalnum():
            out.append(c)
            prev_space = False
        elif not prev_space:
            out.append(" ")
            prev_space = True
    return "".join(out).strip()


def char_shingles(t: str, k: int = 5):
    """Shingles.charShingles: distinct sorted k-gram hashes (seed 1)."""
    c = canonical(t)
    if len(c) < k:
        return [] if not c else [hash_range(c, 1)]
    return sorted({hash_range(c[i:i + k], 1) for i in range(len(c) - k + 1)})


def jaccard(a, b) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    sa, sb = set(a), set(b)
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def round6(x: float) -> float:
    """Spark round(col, 6): BigDecimal.valueOf(double) (shortest repr, same
    as Python repr) setScale(6, HALF_UP)."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


# -- q16: one-permutation MinHash + banded LSH ------------------------------

N_HASHES = 128
BANDS = 16
ROWS_PER_BAND = 8
SHINGLE_K = 5
MIN_JACCARD = 0.8
MAX_BUCKET = 64
LSH_SEED = 7


def oph_signature(shingles):
    """MinHashLSH.signature: one mix64 per shingle routed to bin
    (h >>> 1) % 128, SIGNED min per bin, rotation densification."""
    sig = [LONG_MAX] * N_HASHES  # unsigned storage of signed Long.MaxValue
    seed_mix = mix64(LSH_SEED)
    for sh in shingles:
        h = mix64(sh ^ seed_mix)
        b = (h >> 1) % N_HASHES  # Java >>> 1 on the unsigned domain
        if s64(h) < s64(sig[b]):
            sig[b] = h
    if not shingles:
        return sig
    if any(v == LONG_MAX for v in sig):
        dense = [0] * N_HASHES
        for i in range(N_HASHES):
            if sig[i] != LONG_MAX:
                dense[i] = sig[i]
            else:
                d = 1
                while sig[(i + d) % N_HASHES] == LONG_MAX:
                    d += 1
                dense[i] = mix64(sig[(i + d) % N_HASHES] ^ (d * 0xDEADBEEF))
        return dense
    return sig


def band_hashes(sig):
    out = []
    for b in range(BANDS):
        h = (LSH_SEED ^ b) & M64
        for r in range(b * ROWS_PER_BAND, (b + 1) * ROWS_PER_BAND):
            h = mix64(h ^ sig[r])
        out.append(h)
    return out


def minhash_pairs(docs):
    """docs: list of (id_signed, text). Returns (id_a, id_b, jaccard6)."""
    shingle_of = {i: char_shingles(t, SHINGLE_K) for i, t in docs}
    bands_of = {i: band_hashes(oph_signature(shingle_of[i])) for i, t in docs}
    buckets = {}
    for i, _ in docs:
        for band, bh in enumerate(bands_of[i]):
            buckets.setdefault((band, bh), []).append(i)
    pairs = []
    for (band, _bh), ids in buckets.items():
        if len(ids) < 2:
            continue
        ids = sorted(ids)[:MAX_BUCKET]  # BucketCap: the MAX_BUCKET lowest ids
        for x in range(len(ids)):
            bx = bands_of[ids[x]]
            for y in range(x + 1, len(ids)):
                by = bands_of[ids[y]]
                fb = 0
                while bx[fb] != by[fb]:
                    fb += 1
                if fb != band:  # first-collision dedup
                    continue
                jac = jaccard(shingle_of[ids[x]], shingle_of[ids[y]])
                if jac >= MIN_JACCARD:
                    pairs.append((ids[x], ids[y], round6(jac)))
    return sorted(pairs)


# -- q18: SimHash + Manku block rotation ------------------------------------

SIM_SEED = 11
SIM_BLOCKS = 4
SIM_WIDTH = 16
MAX_HAMMING = 3
SIM_MAX_BUCKET = 256


def simhash(text: str) -> int:
    words = [w for w in canonical(text).split(" ") if w]
    if not words:
        return 0
    acc = [0] * 64
    def add(h):
        for b in range(64):
            acc[b] += 1 if (h >> b) & 1 else -1
    for i, w in enumerate(words):
        h1 = mix64(SIM_SEED ^ hash_range(w, SIM_SEED))
        add(h1)
        if i + 1 < len(words):
            add(mix64(h1 ^ hash_range(words[i + 1], SIM_SEED)))
    sig = 0
    for b in range(64):
        if acc[b] > 0:
            sig |= 1 << b
    return sig


def simhash_pairs(docs):
    """Returns (id_a, id_b, hamming) via the capped block-rotation scheme."""
    sig_of = {i: simhash(t) for i, t in docs}
    def block(sig, b):
        return (sig >> (b * SIM_WIDTH)) & ((1 << SIM_WIDTH) - 1)
    buckets = {}
    for i, _ in docs:
        for b in range(SIM_BLOCKS):
            buckets.setdefault((b, block(sig_of[i], b)), []).append(i)
    pairs = []
    for (b, _v), ids in buckets.items():
        if len(ids) < 2:
            continue
        ids = sorted(ids)[:SIM_MAX_BUCKET]
        for x in range(len(ids)):
            sx = sig_of[ids[x]]
            for y in range(x + 1, len(ids)):
                sy = sig_of[ids[y]]
                h = bin(sx ^ sy).count("1")
                if h > MAX_HAMMING:
                    continue
                fb = 0
                while block(sx, fb) != block(sy, fb):
                    fb += 1
                if fb == b:
                    pairs.append((ids[x], ids[y], h))
    return sorted(pairs)


# -- XXH64 (public spec, seed 42 = Spark xxhash64 default) -------------------

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


# (implementation shared verbatim with tools/gen_bucket_golden.py — the
# q31 oracle's bit-exact replication of Spark's xxhash64)


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


def main():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT id, text FROM read_parquet('{CORPUS}') ORDER BY id").fetchall()
    assert len(rows) > 1000, f"suspiciously small corpus: {len(rows)}"
    # re-verify the id chain: id == signed XXH64(text, 42)
    for i, t in rows:
        assert i == s64(xxh64(t.encode("utf-8"))), f"id mismatch for {i}"
    docs = [(i, t) for i, t in rows]

    mh = minhash_pairs(docs)
    sh = simhash_pairs(docs)
    print(f"minhash pairs: {len(mh)}, simhash pairs: {len(sh)}")

    con.execute("CREATE TABLE mh (id_a BIGINT, id_b BIGINT, jaccard DOUBLE)")
    con.executemany("INSERT INTO mh VALUES (?, ?, ?)", mh)
    con.execute(f"COPY mh TO '{OUT_DIR}/minhash_pairs_sf001.parquet' (FORMAT PARQUET)")
    con.execute("CREATE TABLE sh (id_a BIGINT, id_b BIGINT, hamming INTEGER)")
    con.executemany("INSERT INTO sh VALUES (?, ?, ?)", sh)
    con.execute(f"COPY sh TO '{OUT_DIR}/simhash_pairs_sf001.parquet' (FORMAT PARQUET)")
    print(f"wrote goldens to {OUT_DIR}")


if __name__ == "__main__":
    main()
