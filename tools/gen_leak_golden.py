#!/usr/bin/env python3
"""Dev-time golden generator for the q73 benchmark-leak-report oracle.

Fully independent Python re-derivation of text.SpanDecontaminate.leakReport's
contract (no JVM, no shared code, no hashes — string membership decides):

  - benchmark = (bench_id = source doc_id, excerpt text[40:140]) of every
    document with doc_id % 10 == 0 and len(text) >= 140;
  - corpus = all documents with doc_id % 10 != 0 (the eval items themselves
    are NOT in the audited corpus — leakage comes from template twins);
  - per eval item: n_windows = DISTINCT k-char windows (k = 30) of the
    excerpt; n_found = how many of them appear verbatim in ANY corpus doc.

Output parquet: (bench_id, n_windows, n_found).

Usage: python3 tools/gen_leak_golden.py [documents_parquet] [out_parquet]
"""
import sys

import duckdb

DOCS = (sys.argv[1] if len(sys.argv) > 1
        else "/root/testdata/sf0.01/documents.parquet")
OUT = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/golden/leak_sf001.parquet")

K = 30


def main():
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{DOCS}') "
        "ORDER BY doc_id").fetchall()
    assert len(rows) >= 100, f"suspiciously small corpus: {len(rows)}"

    bench = {}
    for doc_id, t in rows:
        if doc_id % 10 == 0 and t is not None and len(t) >= 140:
            ex = t[40:140]
            bench[doc_id] = {ex[i:i + K] for i in range(len(ex) - K + 1)}
    assert bench, "empty benchmark"
    probes = set().union(*bench.values())

    found = set()
    for doc_id, t in rows:
        if doc_id % 10 == 0 or t is None or len(t) < K:
            continue
        for i in range(len(t) - K + 1):
            w = t[i:i + K]
            if w in probes:
                found.add(w)

    out = [(bid, len(ws), sum(1 for w in ws if w in found))
           for bid, ws in sorted(bench.items())]

    con = duckdb.connect()
    con.execute("CREATE TABLE g (bench_id BIGINT, n_windows BIGINT, "
                "n_found BIGINT)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?)", out)
    con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
    fracs = sorted(r[2] / r[1] for r in out)
    print(f"wrote {len(out)} rows ({len(probes)} probes, "
          f"{len(found)} found; leak fracs min {fracs[0]:.2f} "
          f"median {fracs[len(fracs)//2]:.2f} max {fracs[-1]:.2f}) -> {OUT}")


if __name__ == "__main__":
    main()
