#!/usr/bin/env python3
"""Dev-time golden generator for the q72 span-decontamination oracle.

Fully independent Python re-derivation of text.SpanDecontaminate's contract
from first principles (no JVM, no shared code, NO HASHES — the contract is
hash-free; the Scala rolling hash is only a prefilter whose collisions are
killed by the string check):

  - benchmark = the 100-char excerpt text[40:140] of every document with
    doc_id % 10 == 0 and len(text) >= 140 — the realistic leak shape (eval
    sets quote web text verbatim), and the source docs STAY in the corpus,
    so each is guaranteed contaminated; corpus = ALL documents;
  - probe set = every k-char window (k = 30) of every benchmark text,
    as plain Python strings (str.__getitem__ slices == Java
    String.substring for these ASCII texts; both index UTF-16/ASCII
    units);
  - corpus position i is marked iff text[i:i+k] is in the probe set;
  - marked positions merge into disjoint spans with the SubstrDedup
    cutSpans rule: open a span at the first marked i with end = i+k,
    extend end to j+k for any marked j <= current end, cut [start, end);
  - output (doc_id, cleaned, n_spans, chars_removed) for ALL corpus docs.

Usage: python3 tools/gen_spandecon_golden.py [documents_parquet] [out]
"""
import sys

import duckdb

DOCS = (sys.argv[1] if len(sys.argv) > 1
        else "/root/testdata/sf0.01/documents.parquet")
OUT = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/golden/spandecon_sf001.parquet")

K = 30


def cut_spans(t: str, marked):
    n_spans = 0
    removed = 0
    out = []
    keep_from = 0
    i = 0
    n = len(marked)
    while i < n:
        if marked[i]:
            start = i
            end = i + K
            j = i + 1
            while j < n and j <= end:
                if marked[j]:
                    end = j + K
                j += 1
            out.append(t[keep_from:max(start, keep_from)])
            keep_from = end
            removed += end - start
            n_spans += 1
            i = end
        else:
            i += 1
    out.append(t[min(keep_from, len(t)):])
    return "".join(out), n_spans, removed


def main():
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{DOCS}') "
        "ORDER BY doc_id").fetchall()
    assert len(rows) >= 100, f"suspiciously small corpus: {len(rows)}"

    probes = set()
    n_bench = 0
    for doc_id, t in rows:
        if doc_id % 10 == 0 and t is not None and len(t) >= 140:
            ex = t[40:140]
            assert all(ord(c) < 128 for c in ex), \
                "non-ASCII: Python slice vs Spark substring only proven equal for ASCII"
            n_bench += 1
            for i in range(len(ex) - K + 1):
                probes.add(ex[i:i + K])
    assert probes, "empty probe set: benchmark texts shorter than k?"

    out = []
    n_hit_docs = 0
    for doc_id, t in rows:
        if t is None or len(t) < K:
            out.append((doc_id, t, 0, 0))
            continue
        marked = [t[i:i + K] in probes for i in range(len(t) - K + 1)]
        cleaned, n_spans, removed = cut_spans(t, marked)
        if n_spans:
            n_hit_docs += 1
        out.append((doc_id, cleaned, n_spans, removed))

    con = duckdb.connect()
    con.execute("CREATE TABLE g (doc_id BIGINT, cleaned VARCHAR, "
                "n_spans INT, chars_removed INT)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?, ?)", out)
    con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
    total = sum(r[2] for r in out)
    print(f"wrote {len(out)} rows ({n_bench} benchmark excerpts, {len(probes)} probe windows, "
          f"{n_hit_docs} contaminated docs, {total} spans cut) -> {OUT}")


if __name__ == "__main__":
    main()
