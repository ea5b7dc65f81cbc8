#!/usr/bin/env python3
"""Dev-time golden generator for the q86 (distributed full-batch logistic
trainer) oracle.

Independent (non-JVM) re-derivation of Classifier.trainDistributed's full
chain, reusing gen_classifier_golden's featurization / corruption /
scoring primitives (they are already the independent Python
implementations of that contract):

  same labeled set as q67 (originals label 1, digit-corrupted negatives
  label 0 at doc_id + 1e6) ->
  exact integer document frequency per bucket, once (the preconditioner
  denominator; the bias slot sees every doc) ->
  per epoch, for EVERY document: f64 dot against the current weights in
  ascending-bucket order, sigmoid truncated to float32 AND clamped to
  exact 0/1 beyond |z| > 30 (saturated either way; CPython math.exp
  raises OverflowError past ~|710| where Java returns Infinity),
  err = p - y, per-bucket contribution quantized ONCE to integer
  micro-units floor(err * x_b * 1e6 + 0.5) (bias slot =
  floor(err * 1e6 + 0.5)) ->
  EXACT integer gradient sums (order-independent, matching Spark's Long
  sum) -> fixed-ascending-order df-preconditioned driver updates
  w_b -= LR * (g_b / 1e6 / df_b) ->
  final distributed scoring (same dot order, the UNCLAMPED truncated
  sigmoid — Model.score's expression; |z| stays far under the exp range
  here — and Spark round(x, 6) HALF_UP).

Exactness: the only transcendental (exp) is absorbed by the float32
truncation per call (the gen_classifier_golden precedent); every other
op is either exact integer arithmetic or an IEEE f64 expression
replicated in the JVM's evaluation order.

Input: /root/testdata/sf0.01/documents.parquet (read directly).

Usage: python3 tools/gen_lrdist_golden.py [sf_dir] [out_dir]
"""
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_classifier_golden import (  # noqa: E402
    F32, N_BUCKETS, corrupt, featurize, round6, sigmoid32)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "src/test/resources/golden"

EPOCHS = 3
LR = 5000.0


def sigmoid32_clamped(z: float):
    if z < -30.0:
        return F32(0.0)
    if z > 30.0:
        return F32(1.0)
    return sigmoid32(z)


def main():
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet') "
        "ORDER BY doc_id").fetchall()
    assert len(rows) == 500, "unexpected sf0.01 documents"
    labeled = [(i, t, 1) for i, t in rows] + \
              [(i + 1000000, corrupt(i, t), 0) for i, t in rows]
    n_docs = len(labeled)

    feats = [(doc_id, featurize(text), y) for doc_id, text, y in labeled]

    df = [0] * (N_BUCKETS + 1)
    for _, (ks, _), _ in feats:
        for k in ks:
            df[k] += 1
    df[N_BUCKETS] = n_docs

    w = [0.0] * N_BUCKETS
    bias = 0.0
    for _ in range(EPOCHS):
        g = [0] * (N_BUCKETS + 1)
        for _, (ks, vs), y in feats:
            z = bias
            for k, v in zip(ks, vs):
                z += w[k] * v
            err = float(sigmoid32_clamped(z)) - y
            for k, v in zip(ks, vs):
                g[k] += int(math.floor(err * v * 1e6 + 0.5))
            g[N_BUCKETS] += int(math.floor(err * 1e6 + 0.5))
        for k in range(N_BUCKETS):
            if df[k] > 0:
                w[k] -= LR * (g[k] / 1e6 / df[k])
        bias -= LR * (g[N_BUCKETS] / 1e6 / df[N_BUCKETS])

    out = []
    correct = 0
    for doc_id, (ks, vs), y in feats:
        z = bias
        for k, v in zip(ks, vs):
            z += w[k] * v
        s = sigmoid32(z)
        pred = bool(s >= F32(0.5))
        correct += int(pred == (y == 1))
        out.append((doc_id, y, round6(float(s)), pred))
    out.sort()
    acc = correct / len(out)
    print(f"full-batch train-set accuracy vs labels: {acc:.4f}")
    assert acc >= 0.95, "distributed trainer failed to separate the classes"

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE q86 (doc_id BIGINT, label INTEGER, score DOUBLE, "
        "pred BOOLEAN)")
    con.executemany("INSERT INTO q86 VALUES (?, ?, ?, ?)", out)
    con.execute(
        f"COPY q86 TO '{OUT_DIR}/lrdist_sf001.parquet' (FORMAT PARQUET)")
    print(f"q86: {len(out)} rows -> {OUT_DIR}/lrdist_sf001.parquet")


if __name__ == "__main__":
    main()
