#!/usr/bin/env python3
"""Dev-time golden generator for the q26 UAX#29 word-count oracle.

Independent (non-JVM) re-derivation of UAX#29 word counting for the
testdata document corpus, committed as a per-doc parquet the DuckDB oracle
reads — turning q26 from a rows-only driver row into an exact comparison.

Scope guard: full UAX#29 needs the Unicode Word_Break property table; the
committed corpus is far simpler (lowercase ASCII letters + spaces — the
generator asserts this), where the segmentation reduces exactly to
alphanumeric runs (each run is one word segment containing an alnum; space
runs are discarded). If the corpus ever grows richer characters the
assertion fails loudly and this generator must be extended, never silently
approximated.

Usage: python3 tools/gen_uax29_golden.py [sf_dir] [out_parquet]
(defaults: /root/testdata/sf0.01 → src/test/resources/golden/uax29_sf001.parquet)
"""
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/golden/uax29_sf001.parquet")

ALLOWED = set("abcdefghijklmnopqrstuvwxyz"
              "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 \t\n")


def uax29_count_simple(text: str) -> int:
    bad = {c for c in text if c not in ALLOWED}
    assert not bad, (
        f"corpus contains {sorted(bad)!r} — outside the alnum+space subset "
        "this simplified UAX#29 segmentation is exact for; extend the rules")
    n, in_run = 0, False
    for c in text:
        if c.isalnum():
            if not in_run:
                n += 1
                in_run = True
        else:
            in_run = False
    return n


con = duckdb.connect()
rows = con.execute(
    f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
).fetchall()
golden = [(doc_id, uax29_count_simple(text or "")) for doc_id, text in rows]
con.execute("CREATE TABLE g (doc_id BIGINT, n_words_uax29 INTEGER)")
con.executemany("INSERT INTO g VALUES (?, ?)", golden)
con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
print(f"wrote {len(golden)} golden UAX#29 counts to {OUT}")
