#!/usr/bin/env python3
"""Dev-time golden generator for the q74 global line-dedup oracle.

Fully independent Python re-derivation of text.LineDedup's contract (no
JVM, no shared code, no hashes — the contract is defined on line strings;
the Scala xxhash64 pass is only a prefilter whose collisions are resolved
by the string-keyed aggregation):

  - derive a line structure first: the documents table is single-line, so
    each text is wrapped into lines of 4 single-space-split tokens
    (tokens = text.split(" "); lines = " ".join of each group of 4 —
    mirrored in the Spark query with split/sequence/slice/array_join);
  - split every non-null wrapped text on '\\n' (trailing empties kept —
    matches Spark split(text, '\\n', -1));
  - a line with len >= MIN_LINE_LEN (15) whose exact text occurs more than
    once across the WHOLE corpus is removed everywhere except its first
    occurrence in (doc_id, line_pos) order; shorter lines are always kept;
  - cleaned = '\\n'.join(kept lines); n_lines_removed = dropped count.

Output parquet: (doc_id, cleaned, n_lines_removed) for all documents.

Usage: python3 tools/gen_linededup_golden.py [documents_parquet] [out]
"""
import sys
from collections import Counter

import duckdb

DOCS = (sys.argv[1] if len(sys.argv) > 1
        else "/root/testdata/sf0.01/documents.parquet")
OUT = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/golden/linededup_sf001.parquet")

MIN_LINE_LEN = 15


def main():
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{DOCS}') "
        "ORDER BY doc_id").fetchall()
    assert len(rows) >= 100, f"suspiciously small corpus: {len(rows)}"

    def wrap(t):
        ws = t.split(" ")
        return "\n".join(" ".join(ws[i:i + 4]) for i in range(0, len(ws), 4))

    counts = Counter()
    for _, t in rows:
        if t is None:
            continue
        for ln in wrap(t).split("\n"):
            if len(ln) >= MIN_LINE_LEN:
                counts[ln] += 1

    seen = set()
    out = []
    n_docs_hit = 0
    total_removed = 0
    for doc_id, t in rows:  # rows are (doc_id, pos)-ordered already
        if t is None:
            out.append((doc_id, None, 0))
            continue
        kept = []
        removed = 0
        for ln in wrap(t).split("\n"):
            if len(ln) >= MIN_LINE_LEN and counts[ln] > 1:
                if ln in seen:
                    removed += 1
                    continue
                seen.add(ln)
            kept.append(ln)
        if removed:
            n_docs_hit += 1
        total_removed += removed
        out.append((doc_id, "\n".join(kept), removed))

    con = duckdb.connect()
    con.execute("CREATE TABLE g (doc_id BIGINT, cleaned VARCHAR, "
                "n_lines_removed INT)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?)", out)
    con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
    dup_lines = sum(1 for c in counts.values() if c > 1)
    print(f"wrote {len(out)} rows ({dup_lines} duplicated distinct lines, "
          f"{n_docs_hit} docs touched, {total_removed} lines removed) "
          f"-> {OUT}")


if __name__ == "__main__":
    main()
