#!/usr/bin/env python3
"""Dev-time golden generator for the q69 Kneser-Ney scorer oracle.

Fully independent Python re-derivation of text.KnScorer's contract (no JVM,
no shared code): train the interpolated-KN bigram model on the EVEN-doc_id
half of the documents corpus (the deterministic "curated seed"; scoring the
odd half exercises every OOV/backoff branch at oracle level) exactly as
tools/gen_kn_golden.py does (CPython str.split tokens, dict counts, the q68
fixed-op-order count-ratio arithmetic, D = 0.75), then

  - quantize each model entry ONCE to integer micro-nats with the canonical
    quantizer  floor(log(p) * 1e6 + 0.5)  (CPython math.log == Java
    Math.log bit-for-bit on >99.9% of count-ratio inputs on this platform,
    at most 1 ulp apart on the rest; a flip needs ln(p)*1e6 within ~1e-10
    of a half-integer — ~2e-13 per entry);
      pair[a][b] = micro(p_KN(b|a))            (UNROUNDED p, see KnScorer)
      ctx[a]     = micro((D * n1p_fwd[a]) / c1[a])
      cont[b]    = micro(n1p_bwd[b] / n1p_all)
      unk        = micro(1 / (n1p_all + 1))
  - score every document: for each adjacent token pair (a, b)
      seen pair           -> pair[a][b]
      unseen pair, a seen -> ctx[a] + (cont[b] if b seen else unk)  [oov]
      a unseen            ->          (cont[b] if b seen else unk)  [oov]
    score_micro = plain integer sum (associative — the whole point).

Output parquet: (doc_id, n_bigrams, n_oov, score_micro) for ALL documents.

Usage: python3 tools/gen_kn_score_golden.py [documents_parquet] [out_parquet]
"""
import math
import sys
from collections import Counter

import duckdb

DOCS = (sys.argv[1] if len(sys.argv) > 1
        else "/root/testdata/sf0.01/documents.parquet")
OUT = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/golden/kn_score_sf001.parquet")

D = 0.75


def micro(p: float) -> int:
    return math.floor(math.log(p) * 1e6 + 0.5)


def main():
    rows = duckdb.sql(
        f"SELECT doc_id, coalesce(text, '') FROM read_parquet('{DOCS}') "
        "ORDER BY doc_id").fetchall()
    assert len(rows) >= 100, f"suspiciously small corpus: {len(rows)}"

    c12 = Counter()
    for doc_id, t in rows:
        if doc_id % 2 != 0:
            continue
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] += 1

    c1 = Counter()
    n1p_fwd = Counter()
    n1p_bwd = Counter()
    for (a, b), nn in c12.items():
        c1[a] += nn
        n1p_fwd[a] += 1
        n1p_bwd[b] += 1
    n1p_all = len(c12)

    pair = {}
    ctx = {}
    cont = {}
    for (a, b), nn in c12.items():
        p = (max(float(nn) - D, 0.0) +
             (D * float(n1p_fwd[a])) * (float(n1p_bwd[b]) / float(n1p_all))) \
            / float(c1[a])
        pair.setdefault(a, {})[b] = micro(p)
        if a not in ctx:
            ctx[a] = micro((D * float(n1p_fwd[a])) / float(c1[a]))
        if b not in cont:
            cont[b] = micro(float(n1p_bwd[b]) / float(n1p_all))
    unk = micro(1.0 / (float(n1p_all) + 1.0))

    out = []
    for doc_id, t in rows:
        ws = t.split()
        s = 0
        oov = 0
        for a, b in zip(ws, ws[1:]):
            hit = pair.get(a, {}).get(b)
            if hit is not None:
                s += hit
            else:
                oov += 1
                base = cont.get(b, unk)
                s += ctx.get(a, 0) + base
        out.append((doc_id, max(0, len(ws) - 1), oov, s))

    con = duckdb.connect()
    con.execute("CREATE TABLE g (doc_id BIGINT, n_bigrams BIGINT, "
                "n_oov BIGINT, score_micro BIGINT)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?, ?)", out)
    con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
    n_oov_docs = sum(1 for r in out if r[2] > 0)
    print(f"wrote {len(out)} rows ({n1p_all} model entries, "
          f"{n_oov_docs} docs with OOV bigrams) -> {OUT}")


if __name__ == "__main__":
    main()
