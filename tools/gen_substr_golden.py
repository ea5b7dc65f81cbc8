#!/usr/bin/env python3
"""Dev-time golden generator for the q63 repeated-substring-dedup oracle.

Independent (non-JVM) derivation of the q63 semantics from first
principles — plain substring counting, NO hashes anywhere (the engine's
rolling-hash prefilter + substring recount is an optimization the oracle
must prove semantics-neutral): every 30-char window occurring >= 5 times
corpus-wide (per OCCURRENCE, within-doc repeats included) marks its span;
overlapping/touching spans merge; merged spans are cut in one pass (seams
are not re-scanned — the Lee et al. 2022 ExactSubstr contract).

Input: the corpus dump from `sbt "Test/runMain graft.GoldenPairCorpus"`
(the same (id, text) near-dup corpus q63 consumes at sf0.01). The 6
non-ASCII docs are BMP-only (guarded), so Python code-point slicing equals
Java UTF-16 substring.

Usage: python3 tools/gen_substr_golden.py [corpus_parquet] [out_parquet]
"""
import sys
from collections import Counter

import duckdb

CORPUS = (sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_pair_corpus.parquet")
OUT = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/golden/substr_dedup_sf001.parquet")

K = 30
MIN_COUNT = 5


def cut_spans(t: str, frequent) -> tuple:
    """Mark positions whose window is frequent, merge overlapping/touching
    spans, cut them. Returns (cleaned, n_spans, chars_removed)."""
    n = len(t) - K + 1
    marked = [t[i:i + K] in frequent for i in range(n)] if n > 0 else []
    out = []
    keep_from = 0
    n_spans = 0
    removed = 0
    i = 0
    while i < len(marked):
        if marked[i]:
            start, end = i, i + K
            j = i + 1
            while j < len(marked) and j <= end:
                if marked[j]:
                    end = j + K
                j += 1
            out.append(t[keep_from:start])
            keep_from = end
            removed += end - start
            n_spans += 1
            i = end
        else:
            i += 1
    out.append(t[keep_from:])
    return "".join(out), n_spans, removed


def main():
    rows = duckdb.sql(
        f"SELECT id, text FROM read_parquet('{CORPUS}') ORDER BY id").fetchall()
    assert len(rows) > 1000, f"suspiciously small corpus: {len(rows)}"
    for _, t in rows:
        assert all(ord(c) < 0x10000 for c in t), "non-BMP char: Java substring diverges"

    counts = Counter()
    for _, t in rows:
        for i in range(len(t) - K + 1):
            counts[t[i:i + K]] += 1
    frequent = {w for w, n in counts.items() if n >= MIN_COUNT}

    golden = []
    for doc_id, t in rows:
        cleaned, n_spans, removed = cut_spans(t, frequent)
        golden.append((doc_id, cleaned, n_spans, removed))

    con = duckdb.connect()
    con.execute("CREATE TABLE g (id BIGINT, cleaned VARCHAR, "
                "n_spans INTEGER, chars_removed INTEGER)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?, ?)", golden)
    con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
    n_hit = sum(1 for _, _, s, _ in golden if s > 0)
    total_removed = sum(r for _, _, _, r in golden)
    print(f"wrote {len(golden)} rows ({n_hit} docs with spans, "
          f"{len(frequent)} frequent windows, {total_removed} chars cut) -> {OUT}")


if __name__ == "__main__":
    main()
