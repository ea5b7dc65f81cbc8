#!/usr/bin/env python3
"""Dev-time golden generator for the q68 Kneser-Ney bigram-LM oracle.

Fully independent Python re-derivation of text.KnTrainer's contract from
first principles (no JVM, no shared code):

  - tokenize each document with CPython's own str.split() — the actual
    parity target of the mode-A word spec that KnTrainer.pyTokens mirrors;
  - count bigram tokens (consecutive pairs within a document; bigrams never
    cross documents) with a plain dict;
  - c1      = total bigram count with w1 as left context
    n1p_fwd = N1+(w1 .) distinct right continuations of w1
    n1p_bwd = N1+(. w2) distinct left contexts of w2
    n1p_all = N1+(. .)  total number of distinct bigram types;
  - interpolated KN with absolute discount D = 0.75 (exact in binary) in
    the FIXED operation order of the Scala column expression:
        (max(c12 - D, 0.0) + (D * n1p_fwd) * (n1p_bwd / n1p_all)) / c1
    — count ratios only, no transcendentals, so IEEE doubles replicate
    op-for-op; then Spark round(x, 6) HALF_UP via Decimal(repr(x));
  - keep the top 500 bigrams by (c12 desc, w1, w2) — the same total order
    as the Scala TakeOrdered, so the head is deterministic.

Output parquet: (w1, w2, c12, c1, n1p_fwd, n1p_bwd, p_kn).

Usage: python3 tools/gen_kn_golden.py [documents_parquet] [out_parquet]
"""
import sys
from collections import Counter, defaultdict
from decimal import Decimal, ROUND_HALF_UP

import duckdb

DOCS = (sys.argv[1] if len(sys.argv) > 1
        else "/root/testdata/sf0.01/documents.parquet")
OUT = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/golden/kn_bigram_sf001.parquet")

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
            "non-ASCII char: the (c12 desc, w1, w2) tie-break is only " \
            "proven equal to Spark's UTF-8 binary string order for ASCII"

    c12 = Counter()
    for _, t in rows:
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] += 1

    c1 = Counter()
    n1p_fwd = Counter()
    n1p_bwd = Counter()
    for (a, b), n in c12.items():
        c1[a] += n
        n1p_fwd[a] += 1
        n1p_bwd[b] += 1
    n1p_all = len(c12)

    head = sorted(c12.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    head = head[:TOP_K]

    out = []
    for (a, b), n in head:
        p = (max(float(n) - D, 0.0) +
             (D * float(n1p_fwd[a])) * (float(n1p_bwd[b]) / float(n1p_all))) \
            / float(c1[a])
        out.append((a, b, n, c1[a], n1p_fwd[a], n1p_bwd[b], round6(p)))

    con = duckdb.connect()
    con.execute("CREATE TABLE g (w1 VARCHAR, w2 VARCHAR, c12 BIGINT, "
                "c1 BIGINT, n1p_fwd BIGINT, n1p_bwd BIGINT, p_kn DOUBLE)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?, ?, ?, ?, ?)", out)
    con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
    print(f"wrote {len(out)} rows ({n1p_all} bigram types, "
          f"{sum(c12.values())} bigram tokens) -> {OUT}")


if __name__ == "__main__":
    main()
