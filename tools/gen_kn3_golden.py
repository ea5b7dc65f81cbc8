#!/usr/bin/env python3
"""Dev-time golden generator for the q75 trigram Kneser-Ney oracle.

Fully independent Python re-derivation of text.KnTrainer.trigramModel's
contract (no JVM, no shared code): CPython str.split() tokens, dict counts,
and the interpolated-KN trigram chain (Chen & Goodman 1999, continuation
counts at the lower orders, absolute discount D = 0.75 at every level) in
the FIXED operation order of the Scala column expression:

    P1(c)    = n_c / T
    P2(c|b)  = (max(n_bc - D, 0) + (D * n_b_cont) * P1(c)) / n_b_mid
    P3(c|ab) = (max(c3  - D, 0) + (D * n_ab)     * P2(c|b)) / c_ab

Count ratios only — IEEE doubles replicate op-for-op; Spark round(x, 6)
HALF_UP via Decimal(repr(x)). Top 500 trigrams by (c3 desc, w1, w2, w3).

Output parquet: (w1, w2, w3, c3, c_ab, n_ab, n_bc, n_b_mid, n_b_cont,
n_c, p_kn3).

Usage: python3 tools/gen_kn3_golden.py [documents_parquet] [out_parquet]
"""
import sys
from collections import Counter
from decimal import Decimal, ROUND_HALF_UP

import duckdb

DOCS = (sys.argv[1] if len(sys.argv) > 1
        else "/root/testdata/sf0.01/documents.parquet")
OUT = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/golden/kn_trigram_sf001.parquet")

D = 0.75
TOP_K = 500


def round6(x: float) -> float:
    return float(Decimal(repr(float(x))).quantize(
        Decimal("0.000001"), ROUND_HALF_UP))


def main():
    rows = duckdb.sql(
        f"SELECT doc_id, coalesce(text, '') FROM read_parquet('{DOCS}') "
        "ORDER BY doc_id").fetchall()
    assert len(rows) >= 100, f"suspiciously small corpus: {len(rows)}"
    for _, t in rows:
        assert all(ord(c) < 128 for c in t), \
            "non-ASCII char: the tie-break is only proven equal to " \
            "Spark's UTF-8 binary string order for ASCII"

    c3 = Counter()
    for _, t in rows:
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

    head = sorted(c3.items(),
                  key=lambda kv: (-kv[1], kv[0][0], kv[0][1], kv[0][2]))
    head = head[:TOP_K]

    out = []
    for (a, b, c), n in head:
        p1 = float(n_c[c]) / float(total)
        p2 = (max(float(n_bc[(b, c)]) - D, 0.0) +
              (D * float(n_b_cont[b])) * p1) / float(n_b_mid[b])
        p3 = (max(float(n) - D, 0.0) +
              (D * float(n_ab[(a, b)])) * p2) / float(c_ab[(a, b)])
        out.append((a, b, c, n, c_ab[(a, b)], n_ab[(a, b)], n_bc[(b, c)],
                    n_b_mid[b], n_b_cont[b], n_c[c], round6(p3)))

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE g (w1 VARCHAR, w2 VARCHAR, w3 VARCHAR, c3 BIGINT, "
        "c_ab BIGINT, n_ab BIGINT, n_bc BIGINT, n_b_mid BIGINT, "
        "n_b_cont BIGINT, n_c BIGINT, p_kn3 DOUBLE)")
    con.executemany(
        "INSERT INTO g VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)", out)
    con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
    print(f"wrote {len(out)} rows ({total} trigram types, "
          f"{sum(c3.values())} trigram tokens) -> {OUT}")


if __name__ == "__main__":
    main()
