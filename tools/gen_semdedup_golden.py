#!/usr/bin/env python3
"""Dev-time golden generator for the q66 (SemDeDup) oracle.

Independent (non-JVM) re-derivation of the full SemDeDup chain
(Abbas et al. 2023, arXiv:2303.09540) from its public spec:

  planted near-copies (vec_id % 20 == 0 -> id+1000000, +1e-4f on every
  7th dim, float32 adds) -> deterministic k-means over the UNION corpus
  (hash-ordered sample, first-32-distinct init, driver-order Lloyd,
  5 iters, k=32, seed 17 — the q34 replication) -> nearest-centroid
  assignment carrying cosine-to-centroid -> within-cluster exact-cosine
  union-find at eps=0.98 -> group_id = min vec_id per component ->
  keeper = min (centroid_cos, vec_id) per component (the paper's
  keep-low-centroid-similarity diversity rule).

Exactness: IEEE arithmetic replicated operation-for-operation — float32
payloads via numpy scalars, float64 accumulation in the JVM's sequential
order, Spark's round(x, 6) via Decimal(repr(x)) HALF_UP. Union-find and
the keeper rule are order-independent (float comparisons are exact), so
Spark's shuffle nondeterminism cannot diverge from this sequential replay.

Cluster sizes at sf0.01 (525 vectors, k=32) sit far below the
maxPairwise=4096 sub-cell split, so the single-cell path is what both
sides exercise (the split itself is covered by SemDedupSpec).

Input: /root/testdata/sf0.01/embeddings.parquet (read directly).

Usage:
  python3 tools/gen_semdedup_golden.py [sf_dir] [out_dir]
"""
import math
import sys
from decimal import Decimal, ROUND_HALF_UP

import duckdb
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "src/test/resources/golden"

M64 = (1 << 64) - 1
F32 = np.float32
EPS = 0.98
K = 32


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


def load_corpus():
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet') "
        "ORDER BY vec_id").fetchall()
    emb = [(i, [F32(x) for x in v]) for i, v in rows]
    planted = [
        (i + 1000000,
         [F32(x + F32(1e-4)) if d % 7 == 0 else x for d, x in enumerate(v)])
        for i, v in emb if i % 20 == 0]
    return emb + planted


def kmeans(corpus, k=K, iters=5, seed=17):
    dim = len(corpus[0][1])
    sample = [v for _, v in sorted(
        ((s64(mix64(seed ^ i)), v) for i, v in corpus), key=lambda t: t[0])]
    seen, centroids = set(), []
    for v in sample:
        key = tuple(float(x) for x in v)
        if key not in seen:
            seen.add(key)
            centroids.append(list(v))
        if len(centroids) == k:
            break
    for _ in range(iters):
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
            else [F32(sums[c][d] / counts[c]) for d in range(len(centroids[c]))]
            for c in range(len(centroids))]
    return centroids


def q66(corpus):
    centroids = kmeans(corpus)

    def nearest(v):
        scored = sorted(
            ((i, cosine(v, centroids[i])) for i in range(len(centroids))),
            key=lambda t: (-t[1], t[0]))
        return scored[0]

    by_list = {}
    for vid, v in corpus:
        l, cc = nearest(v)
        by_list.setdefault(l, []).append((vid, v, cc))

    out = []
    for l, members in by_list.items():
        m = sorted(members, key=lambda t: t[0])
        n = len(m)
        parent = list(range(n))

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for i in range(n):
            for j in range(i + 1, n):
                if find(i) != find(j) and cosine(m[i][1], m[j][1]) >= EPS:
                    parent[find(j)] = find(i)
        groups = {}
        for i in range(n):
            groups.setdefault(find(i), []).append(i)
        for idxs in groups.values():
            gid = min(m[i][0] for i in idxs)
            keeper = min(idxs, key=lambda i: (m[i][2], m[i][0]))
            for i in idxs:
                out.append((m[i][0], l, gid, i == keeper, round6(m[i][2])))
    return sorted(out)


def main():
    corpus = load_corpus()
    assert len(corpus) == 525 and len(corpus[0][1]) == 64, "unexpected sf0.01 corpus"
    rows = q66(corpus)
    assert len(rows) == 525
    n_groups = len({r[2] for r in rows})
    n_kept = sum(1 for r in rows if r[3])
    assert n_kept == n_groups, "one keeper per duplicate group"
    assert n_groups < 525, "planted near-copies must form duplicate groups"
    print(f"groups={n_groups} kept={n_kept} dropped={525 - n_kept}")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE q66 (vec_id BIGINT, list_id INTEGER, group_id BIGINT, "
        "keep BOOLEAN, centroid_cos DOUBLE)")
    con.executemany("INSERT INTO q66 VALUES (?, ?, ?, ?, ?)",
                    [(int(a), int(b), int(c), bool(d), float(e)) for a, b, c, d, e in rows])
    con.execute(f"COPY q66 TO '{OUT_DIR}/semdedup_sf001.parquet' (FORMAT PARQUET)")
    print(f"q66: {len(rows)} rows -> {OUT_DIR}/semdedup_sf001.parquet")


if __name__ == "__main__":
    main()
