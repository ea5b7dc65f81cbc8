#!/usr/bin/env python3
"""Dev-time golden generator for the q67 (trained quality classifier) oracle.

Independent (non-JVM) re-derivation of the full classifier chain
(GPT-3 Appendix A / CCNet reference-vs-noise quality filter):

  deterministic digit-corrupted negatives (every 3rd byte position holding
  an ASCII letter -> '0' + mix64(docId*1315423911 ^ i) % 10; corrupted
  doc_id = id + 1000000, label 0; originals label 1) ->
  hashed byte-trigram featurization (key = b0<<16|b1<<8|b2 unsigned,
  bucket = floorMod(mix64(29 ^ key), 65536), value = count/nTrigrams,
  buckets ascending) ->
  driver-order sequential SGD (sample sorted by signed mix64(29 ^ doc_id),
  limit 2048, 3 epochs, lr 0.5, float64 weights, sigmoid truncated to
  float32 per call) ->
  per-doc scoring (same dot-product order, same truncated sigmoid,
  pred = score >= 0.5f, Spark round(x, 6) HALF_UP).

Exactness: every float op replicated in the JVM's sequential order; the
only transcendental (exp) is absorbed by the float32 truncation with
probability ~1-2^-29 per call (the gen_ann_golden.py Box-Muller
precedent) — a mismatch would be a hard oracle red, not silent drift.

Input: /root/testdata/sf0.01/documents.parquet (read directly).

Usage:
  python3 tools/gen_classifier_golden.py [sf_dir] [out_dir]
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
N_BUCKETS = 1 << 16
SEED = 29
EPOCHS = 3
LR = 0.5
SAMPLE = 2048


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


def corrupt(doc_id: int, text: str) -> str:
    b = bytearray(text.encode("utf-8"))
    for i in range(0, len(b), 3):
        c = b[i]
        if (65 <= c <= 90) or (97 <= c <= 122):
            # JVM: mix64(docId * 1315423911L ^ i) — Long multiply wraps mod 2^64
            b[i] = ord("0") + (s64(mix64(((doc_id * 1315423911) & M64) ^ i)) % 10)
    return b.decode("utf-8")


def featurize(text: str):
    b = text.encode("utf-8")
    n = len(b) - 2
    if n <= 0:
        return [], []
    counts = {}
    for i in range(n):
        key = (b[i] << 16) | (b[i + 1] << 8) | b[i + 2]
        bk = s64(mix64(SEED ^ key)) % N_BUCKETS
        counts[bk] = counts.get(bk, 0) + 1
    ks = sorted(counts)
    return ks, [counts[k] / n for k in ks]


def sigmoid32(z: float):
    return F32(1.0 / (1.0 + math.exp(-z)))


def main():
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet') "
        "ORDER BY doc_id").fetchall()
    assert len(rows) == 500, "unexpected sf0.01 documents"
    labeled = [(i, t, 1) for i, t in rows] + \
              [(i + 1000000, corrupt(i, t), 0) for i, t in rows]

    # train: hash-ordered sample, sequential SGD
    sample = sorted(labeled, key=lambda r: s64(mix64(SEED ^ r[0])))[:SAMPLE]
    w = [0.0] * N_BUCKETS
    bias = 0.0
    for _ in range(EPOCHS):
        for _, text, y in sample:
            ks, vs = featurize(text)
            z = bias
            for k, v in zip(ks, vs):
                z += w[k] * v
            g = float(sigmoid32(z)) - y
            for k, v in zip(ks, vs):
                w[k] -= LR * g * v
            bias -= LR * g

    # score everything
    out = []
    correct = 0
    for doc_id, text, y in labeled:
        ks, vs = featurize(text)
        z = bias
        for k, v in zip(ks, vs):
            z += w[k] * v
        s = sigmoid32(z)
        pred = bool(s >= F32(0.5))
        correct += int(pred == (y == 1))
        out.append((doc_id, y, round6(float(s)), pred))
    out.sort()
    acc = correct / len(labeled)
    print(f"train-set accuracy vs labels: {acc:.4f}")
    assert acc >= 0.95, "classifier failed to separate reference from noise"

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE q67 (doc_id BIGINT, label INTEGER, score DOUBLE, pred BOOLEAN)")
    con.executemany("INSERT INTO q67 VALUES (?, ?, ?, ?)", out)
    con.execute(f"COPY q67 TO '{OUT_DIR}/classifier_sf001.parquet' (FORMAT PARQUET)")
    print(f"q67: {len(out)} rows -> {OUT_DIR}/classifier_sf001.parquet")


if __name__ == "__main__":
    main()
