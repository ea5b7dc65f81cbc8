#!/usr/bin/env python3
"""Dev-time golden generator for the q76 trigram-KN-scorer oracle.

Fully independent Python re-derivation of text.KnScorer's trigram contract
(no JVM, no shared code): train the trigram KN model on the EVEN-doc_id
half exactly as tools/gen_kn3_golden.py does, quantize each entry ONCE to
integer micro-nats (floor(log(p)*1e6 + 0.5); the single ln per entry is the
only transcendental — see gen_kn_score_golden.py for the Math.log parity
argument), then score every document with plain integer sums:

    tri[abc]   = micro(P3)        ctx3[ab] = micro((D*n_ab)/c_ab)
    pair2[bc]  = micro(P2)        ctx2[b]  = micro((D*n_b_cont)/n_b_mid)
    cont1[c]   = micro(n_c/T)     unk      = micro(1/(T+1))

  per trigram (a,b,c):  seen -> tri[abc]
    else (oov += 1): p2part = pair2[bc] if seen
                     else ctx2.get(b, 0) + cont1.get(c, unk)
                     score += ctx3.get(ab, 0) + p2part

Output parquet: (doc_id, n_trigrams, n_oov, score_micro) for ALL documents.

Usage: python3 tools/gen_kn3_score_golden.py [documents_parquet] [out]
"""
import math
import sys
from collections import Counter

import duckdb

DOCS = (sys.argv[1] if len(sys.argv) > 1
        else "/root/testdata/sf0.01/documents.parquet")
OUT = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/golden/kn3_score_sf001.parquet")

D = 0.75


def micro(p: float) -> int:
    return math.floor(math.log(p) * 1e6 + 0.5)


def main():
    rows = duckdb.sql(
        f"SELECT doc_id, coalesce(text, '') FROM read_parquet('{DOCS}') "
        "ORDER BY doc_id").fetchall()
    assert len(rows) >= 100, f"suspiciously small corpus: {len(rows)}"

    c3 = Counter()
    for doc_id, t in rows:
        if doc_id % 2 != 0:
            continue
        ws = t.split()
        for a, b, c in zip(ws, ws[1:], ws[2:]):
            c3[(a, b, c)] += 1

    c_ab = Counter()
    n_ab = Counter()
    n_bc = Counter()
    n_c = Counter()
    for (a, b, c), n in c3.items():
        c_ab[(a, b)] += n
        n_ab[(a, b)] += 1
        n_bc[(b, c)] += 1
        n_c[c] += 1
    n_b_mid = Counter()
    n_b_cont = Counter()
    for (b, c), n in n_bc.items():
        n_b_mid[b] += n
        n_b_cont[b] += 1
    total = len(c3)

    tri = {}
    ctx3 = {}
    pair2 = {}
    ctx2 = {}
    cont1 = {}
    for (a, b, c), n in c3.items():
        p1 = float(n_c[c]) / float(total)
        p2 = (max(float(n_bc[(b, c)]) - D, 0.0) +
              (D * float(n_b_cont[b])) * p1) / float(n_b_mid[b])
        p3 = (max(float(n) - D, 0.0) +
              (D * float(n_ab[(a, b)])) * p2) / float(c_ab[(a, b)])
        tri[(a, b, c)] = micro(p3)
        if (a, b) not in ctx3:
            ctx3[(a, b)] = micro(
                (D * float(n_ab[(a, b)])) / float(c_ab[(a, b)]))
        if (b, c) not in pair2:
            pair2[(b, c)] = micro(p2)
        if b not in ctx2:
            ctx2[b] = micro((D * float(n_b_cont[b])) / float(n_b_mid[b]))
        if c not in cont1:
            cont1[c] = micro(float(n_c[c]) / float(total))
    unk = micro(1.0 / (float(total) + 1.0))

    out = []
    for doc_id, t in rows:
        ws = t.split()
        s = 0
        oov = 0
        for a, b, c in zip(ws, ws[1:], ws[2:]):
            hit = tri.get((a, b, c))
            if hit is not None:
                s += hit
            else:
                oov += 1
                p2hit = pair2.get((b, c))
                if p2hit is not None:
                    p2part = p2hit
                else:
                    p2part = ctx2.get(b, 0) + cont1.get(c, unk)
                s += ctx3.get((a, b), 0) + p2part
        out.append((doc_id, max(0, len(ws) - 2), oov, s))

    con = duckdb.connect()
    con.execute("CREATE TABLE g (doc_id BIGINT, n_trigrams BIGINT, "
                "n_oov BIGINT, score_micro BIGINT)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?, ?)", out)
    con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
    n_oov_docs = sum(1 for r in out if r[2] > 0)
    print(f"wrote {len(out)} rows ({total} trigram types, "
          f"{n_oov_docs} docs with OOV trigrams) -> {OUT}")


if __name__ == "__main__":
    main()
