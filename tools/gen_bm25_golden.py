#!/usr/bin/env python3
"""Dev-time golden generator for the q80 BM25 retrieval oracle.

Fully independent Python re-derivation of text.Bm25's contract (no JVM,
no shared code) — Robertson BM25, Lucene idf form, k1=1.2 b=0.75:

  - queries: every 20th doc with len(text) >= 140, query text =
    text[40:140] (the q72 probe shape), terms = distinct CPython
    str.split tokens;
  - N, avgdl over the WHOLE corpus (avgdl = one IEEE division of two
    exact integers — bit-identical to the JVM);
  - df(t) = number of corpus docs containing t; idf(t) =
    log(1 + (N - df + 0.5)/(df + 0.5))  (one ln per query term — the
    micro-nat 1-ulp argument from the q69 oracle);
  - per (term, doc): the fixed-op-order chain
        ratio = dl / avgdl;  norm = K1 * (1.0 - B + B * ratio)
        c = idf * ((tf * (K1 + 1.0)) / (tf + norm))
    quantized ONCE to floor(c * 1e6 + 0.5); per (query, doc) the score is
    the plain integer sum over matched terms (order-exact);
  - top-10 per query by (score desc, doc_id asc), 1-based rank.

Output parquet: (query_id, doc_id, n_matched, score_micro, rk).

Usage: python3 tools/gen_bm25_golden.py [documents_parquet] [out_parquet]
"""
import math
import sys
from collections import Counter

import duckdb

DOCS = (sys.argv[1] if len(sys.argv) > 1
        else "/root/testdata/sf0.01/documents.parquet")
OUT = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/golden/bm25_sf001.parquet")

K1 = 1.2
B = 0.75
K = 10


def main():
    rows = duckdb.sql(
        f"SELECT doc_id, coalesce(text, '') FROM read_parquet('{DOCS}') "
        "ORDER BY doc_id").fetchall()
    assert len(rows) >= 100, f"suspiciously small corpus: {len(rows)}"

    queries = [(doc_id, list(dict.fromkeys(t[40:140].split())))
               for doc_id, t in rows
               if doc_id % 20 == 0 and len(t) >= 140]
    assert queries, "no queries survived the probe filter"
    vocab = set(t for _, terms in queries for t in terms)

    toks = {doc_id: t.split() for doc_id, t in rows}
    n = len(rows)
    avgdl = float(sum(len(w) for w in toks.values())) / float(n)

    df = Counter()
    for ws in toks.values():
        for t in set(ws) & vocab:
            df[t] += 1
    idf = {t: math.log(1.0 + (float(n) - df[t] + 0.5) / (df[t] + 0.5))
           for t in vocab}

    out = []
    for qid, terms in queries:
        scored = []
        for doc_id, ws in toks.items():
            tf = Counter(w for w in ws if w in vocab)
            dl = float(len(ws))
            ratio = dl / avgdl
            norm = K1 * (1.0 - B + B * ratio)
            s = 0
            matched = 0
            for t in terms:
                f = tf.get(t)
                if f:
                    matched += 1
                    c = idf[t] * ((float(f) * (K1 + 1.0)) / (float(f) + norm))
                    s += math.floor(c * 1e6 + 0.5)
            if matched:
                scored.append((doc_id, matched, s))
        scored.sort(key=lambda r: (-r[2], r[0]))
        for rk, (doc_id, matched, s) in enumerate(scored[:K], start=1):
            out.append((qid, doc_id, matched, s, rk))

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE g (query_id BIGINT, doc_id BIGINT, n_matched BIGINT, "
        "score_micro BIGINT, rk INTEGER)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?, ?, ?)", out)
    con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
    self_hits = sum(1 for q, d, _, _, rk in out if q == d and rk == 1)
    print(f"wrote {len(out)} rows -> {OUT}  "
          f"({len(queries)} queries; self-retrieved at rank 1: {self_hits})")


if __name__ == "__main__":
    main()
