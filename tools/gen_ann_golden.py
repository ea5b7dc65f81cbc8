#!/usr/bin/env python3
"""Dev-time golden generator for the q20 (LSH ANN), q21 (embedding
near-dup), q34 (IVF ANN) and q23 (media-feature ANN) oracles.

Independent (non-JVM) re-derivation of the full similarity-search chains
from their public specs:

  q20: seeded Box-Muller hyperplanes -> sign-bit signatures -> query probes
       (own bucket + 1-bit flips) -> exact cosine top-k (k=10)
  q21: 12-bit signatures -> multi-probe buckets -> canonical-probe pair
       dedup -> 1024-id caps -> exact cosine >= 0.98 pairs (incl. the 25
       planted +1e-4f near-copies)
  q34: deterministic k-means (hash-ordered sample, driver-order Lloyd,
       5 iters, k=32, seed 17) -> nearest-centroid assignment -> nProbe=8
       probed lists -> exact cosine top-k (k=10)
  q23: BMP/WAV/Y4M byte re-parse (the gen_media_golden.py decoders) ->
       signal-statistics features (luma histogram / RMS envelope, float32
       accumulation, L2 norm) -> exact cosine top-k (k=5)

Exactness: every step is IEEE arithmetic replicated operation-for-
operation — float32 payloads via numpy scalars, float64 accumulation in
the JVM's sequential order, sqrt/division (correctly-rounded ops), and
Spark's round(x, 6) via Decimal(repr(x)) HALF_UP. The only transcendental
step (Box-Muller log/cos in the hyperplanes) is truncated to float32,
which absorbs any ulp-level libm difference with probability ~1-2^-29 per
value; a mismatch would show up as a hard oracle red, not silent drift.

Inputs: /root/testdata/sf0.01/embeddings.parquet (read directly) and the
media byte dump from `sbt "Test/runMain graft.GoldenMedia"`.

Usage:
  python3 tools/gen_ann_golden.py [sf_dir] [media_bytes_parquet] [out_dir]
"""
import math
import struct
import sys
from decimal import Decimal, ROUND_HALF_UP

import duckdb
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
MEDIA_BYTES = (sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_media_bytes.parquet")
OUT_DIR = (sys.argv[3] if len(sys.argv) > 3 else "src/test/resources/golden")

M64 = (1 << 64) - 1
F32 = np.float32


def s64(x: int) -> int:
    x &= M64
    return x - (1 << 64) if x >= (1 << 63) else x


def mix64(z: int) -> int:
    z = (z + 0x9E3779B97F4A7C15) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return z ^ (z >> 31)


def round6(x: float) -> float:
    return float(Decimal(repr(float(x))).quantize(Decimal("0.000001"), ROUND_HALF_UP))


# -- Ann arithmetic (sequential float64 accumulation over float32 values) --

def dot(a, b) -> float:
    s = 0.0
    for i in range(min(len(a), len(b))):
        s += float(a[i]) * float(b[i])
    return s


def norm(a) -> float:
    return math.sqrt(dot(a, a))


def cosine(a, b) -> float:
    d = norm(a) * norm(b)
    return 0.0 if d == 0.0 else dot(a, b) / d


def topk(cands, k):
    """Spark's (score desc, vec_id asc) ranking over (vec_id, score)."""
    ranked = sorted(cands, key=lambda t: (-t[1], t[0]))[:k]
    return [(vid, round6(s), r + 1) for r, (vid, s) in enumerate(ranked)]


def hyperplanes(n_bits, dim, seed):
    planes = []
    for b in range(n_bits):
        row = []
        for d in range(dim):
            u1 = ((mix64(seed ^ (b * 1000003 + d)) >> 11) + 1.0) * (1.0 / (1 << 53))
            u2 = ((mix64(seed ^ (d * 7919 + b) ^ 0x5851F42D) >> 11) + 1.0) * (1.0 / (1 << 53))
            row.append(F32(math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.pi * u2)))
        planes.append(row)
    return planes


def signature(v, planes) -> int:
    sig = 0
    for b, p in enumerate(planes):
        if dot(v, p) >= 0.0:
            sig |= 1 << b
    return sig


def load_embeddings():
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet') "
        "ORDER BY vec_id").fetchall()
    return [(i, [F32(x) for x in v]) for i, v in rows]


# -- q20: lshTopK(emb, queries = vec_id < 20, k = 10, nBits = 10, seed 13) --

def q20(emb):
    planes = hyperplanes(10, len(emb[0][1]), 13)
    queries = [(i, v) for i, v in emb if i < 20]
    sig_of = {i: signature(v, planes) for i, v in emb}
    out = []
    for qid, qv in queries:
        s = signature(qv, planes)
        probes = {s} | {s ^ (1 << b) for b in range(10)}
        qn = norm(qv)
        cands = []
        for vid, v in emb:
            if sig_of[vid] in probes:
                en = norm(v)
                denom = en * qn
                cands.append((vid, 0.0 if denom == 0.0 else dot(qv, v) / denom))
        out += [(qid, vid, sc, r) for vid, sc, r in topk(cands, 10)]
    return out


# -- q21: nearDuplicatePairs over emb + planted copies (0.98, 12 bits) ------

def q21(emb):
    corpus = list(emb)
    for i, v in emb:
        if i % 20 == 0:
            corpus.append((i + 1000000,
                [F32(x + F32(1e-4)) if j % 7 == 0 else x
                 for j, x in enumerate(v)]))
    planes = hyperplanes(12, len(emb[0][1]), 13)
    sig_of = {i: signature(v, planes) for i, v in corpus}
    vec_of = dict(corpus)
    buckets = {}
    for i, _ in corpus:
        s = sig_of[i]
        for p in [s] + [s ^ (1 << b) for b in range(12)]:
            buckets.setdefault(p, []).append(i)

    def canonical_probe(sa, sb):
        best = None
        if bin(sa ^ sb).count("1") <= 1:
            best = min(sa, sb)
        for b in range(12):
            p = sa ^ (1 << b)
            if (best is None or p < best) and bin(p ^ sb).count("1") <= 1:
                best = p
        return best

    pairs = []
    for probe, ids in buckets.items():
        if len(ids) < 2:
            continue
        ids = sorted(ids)[:1024]  # sort_array(struct(vec_id, sig)) + cap
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = ids[x], ids[y]
                if canonical_probe(sig_of[a], sig_of[b]) != probe:
                    continue
                c = cosine(vec_of[a], vec_of[b])
                if c >= 0.98:
                    pairs.append((a, b, round6(c)))
    return sorted(pairs)


# -- q34: IVF train(k=32, sample 4096, 5 iters, seed 17) -> probe(8), k=10 --

def q34(emb):
    dim = len(emb[0][1])
    # hash-ordered sample (signed sort key), all 500 fit in sampleSize
    sample = [v for _, v in sorted(
        ((s64(mix64(17 ^ i)), v) for i, v in emb), key=lambda t: t[0])]
    # init: first 32 distinct vectors
    seen, centroids = set(), []
    for v in sample:
        key = tuple(float(x) for x in v)
        if key not in seen:
            seen.add(key)
            centroids.append(list(v))
        if len(centroids) == 32:
            break
    for _ in range(5):
        sums = [[0.0] * dim for _ in centroids]
        counts = [0] * len(centroids)
        for v in sample:
            best, best_s = 0, -math.inf
            for c in range(len(centroids)):
                s = cosine(v, centroids[c])
                if s > best_s:
                    best_s, best = s, c
            counts[best] += 1
            for d in range(dim):
                sums[best][d] += float(v[d])
        centroids = [
            centroids[c] if counts[c] == 0
            else [F32(sums[c][d] / counts[c]) for d in range(dim)]
            for c in range(len(centroids))]

    def nearest(v, n):
        scored = sorted(
            ((i, cosine(v, centroids[i])) for i in range(len(centroids))),
            key=lambda t: (-t[1], t[0]))
        return [i for i, _ in scored[:n]]

    list_of = {i: nearest(v, 1)[0] for i, v in emb}
    out = []
    for qid, qv in [(i, v) for i, v in emb if i < 20]:
        probes = set(nearest(qv, 8))
        qn = norm(qv)
        cands = []
        for vid, v in emb:
            if list_of[vid] in probes:
                en = norm(v)
                denom = en * qn
                cands.append((vid, 0.0 if denom == 0.0 else dot(qv, v) / denom))
        out += [(qid, vid, sc, r) for vid, sc, r in topk(cands, 10)]
    return out


# -- q23: media features (float32 accumulation) -> brute-force top-5 -------

def media_features(b: bytes, dim=32):
    out = [F32(0.0)] * dim
    if b[:2] == b"BM":
        data_offset, = struct.unpack_from("<I", b, 10)
        w, h_raw = struct.unpack_from("<ii", b, 18)
        h = abs(h_raw)
        row_size = (3 * w + 3) // 4 * 4
        for y in range(h):
            for x in range(w):
                p = data_offset + y * row_size + 3 * x
                lum = (299 * b[p + 2] + 587 * b[p + 1] + 114 * b[p]) // 1000
                i = lum * dim // 256
                out[i] = F32(out[i] + F32(1.0))
    elif b[:4] == b"RIFF":
        off, data_off, data_len = 12, -1, 0
        while data_off < 0:
            size, = struct.unpack_from("<I", b, off + 4)
            if b[off:off + 4] == b"data":
                data_off, data_len = off + 8, size
            else:
                off += 8 + size + (size & 1)
        n = data_len // 2
        acc = [0.0] * dim
        cnt = [0] * dim
        for i in range(n):
            v = struct.unpack_from("<h", b, data_off + 2 * i)[0] / 32768.0
            k = min(dim - 1, i * dim // n)
            acc[k] += v * v
            cnt[k] += 1
        out = [F32(math.sqrt(acc[k] / cnt[k])) if cnt[k] > 0 else F32(0.0)
               for k in range(dim)]
    else:  # Y4M
        eol = b.find(b"\n")
        toks = b[:eol].decode("ascii").split(" ")
        w = next(int(t[1:]) for t in toks if t.startswith("W"))
        h = next(int(t[1:]) for t in toks if t.startswith("H"))
        frame_size = w * h * 3 // 2
        off = eol + 1
        while off < len(b):
            nl = b.find(b"\n", off)
            f = b[nl + 1:nl + 1 + frame_size]
            for i in range(w * h):
                k = f[i] * dim // 256
                out[k] = F32(out[k] + F32(1.0))
            off = nl + 1 + frame_size
    n = math.sqrt(sum(float(x) * float(x) for x in out))
    # Scala: out.map(x => (x / n).toFloat) — float/double division to float
    return [F32(float(x) / n) for x in out] if n > 0 else out


def q23():
    rows = duckdb.sql(
        f"SELECT media_id, content FROM read_parquet('{MEDIA_BYTES}') "
        "ORDER BY media_id").fetchall()
    assert len(rows) == 300, f"expected the 300-row media dump, got {len(rows)}"
    feats = [(mid, media_features(bytes(c))) for mid, c in rows]
    out = []
    for qid, qv in [(i, v) for i, v in feats if i < 5]:
        qn = norm(qv)
        cands = []
        for vid, v in feats:
            en = norm(v)
            denom = en * qn
            cands.append((vid, 0.0 if denom == 0.0 else dot(qv, v) / denom))
        out += [(qid, vid, sc, r) for vid, sc, r in topk(cands, 5)]
    return out


def write(con, name, schema, rows, path):
    con.execute(f"CREATE TABLE {name} ({schema})")
    ph = ", ".join("?" for _ in rows[0])
    con.executemany(f"INSERT INTO {name} VALUES ({ph})", rows)
    con.execute(f"COPY {name} TO '{path}' (FORMAT PARQUET)")
    print(f"{name}: {len(rows)} rows -> {path}")


def main():
    emb = load_embeddings()
    assert len(emb) == 500 and len(emb[0][1]) == 64, "unexpected sf0.01 embeddings"
    con = duckdb.connect()
    write(con, "q20", "query_id BIGINT, vec_id BIGINT, score DOUBLE, rank INTEGER",
          q20(emb), f"{OUT_DIR}/ann_lsh_sf001.parquet")
    write(con, "q21", "id_a BIGINT, id_b BIGINT, cosine DOUBLE",
          q21(emb), f"{OUT_DIR}/embed_neardup_sf001.parquet")
    write(con, "q34", "query_id BIGINT, vec_id BIGINT, score DOUBLE, rank INTEGER",
          q34(emb), f"{OUT_DIR}/ann_ivf_sf001.parquet")
    write(con, "q23", "query_id BIGINT, vec_id BIGINT, score DOUBLE, rank INTEGER",
          q23(), f"{OUT_DIR}/media_ann_sf001.parquet")


if __name__ == "__main__":
    main()
