#!/usr/bin/env python3
"""Dev-time golden generator for the q59 capstone's span-cut stage.

Round 5 inserts repeated-substring span dedup (Lee et al. 2022 order:
document-level dedup first, then exact-substring span cutting) between the
capstone's near-dup stage and decontamination. The recursive-CTE oracle can
express every other stage in SQL but not the span cut, so the cut texts are
replayed from this committed golden — derived INDEPENDENTLY from first
principles (no JVM, no hashes):

  1. exact dedup: keep min doc_id per distinct text (the md5-grouping in the
     SQL oracle collapses identical texts; grouping by the text itself is the
     same partition),
  2. near-dup: distinct word-bigram sets, Jaccard >= 0.5 pairs, connected
     components, keep the min-id representative — the same logic the SQL
     oracle's recursive CTE computes; the oracle still computes its own `dd`
     and inner-joins this golden on doc_id, so any disagreement between this
     derivation and the CTE surfaces as dropped rows / a hash mismatch,
  3. span cut over the survivors: every K-char window occurring >= MIN_COUNT
     times corpus-wide (per occurrence) marks its span; overlapping/touching
     spans merge; merged spans are cut in one pass (seams not re-scanned) —
     identical contract to tools/gen_substr_golden.py. K=25 / MIN_COUNT=2:
     minCount=2 is the published ExactSubstr default (a substring repeated
     anywhere is a duplicate); K is scaled down from Lee et al.'s 50 because
     the synthetic docs are ~150 chars (K=30 cuts nothing post-dedup; K=25
     marks 255 spans across 184 of 476 survivors without emptying any doc).

Input: the driver-generated documents table (public synthetic test data).
Usage: python3 tools/gen_capstone_substr_golden.py [documents_parquet] [out]
"""
import sys
from collections import Counter

import duckdb

DOCS = (sys.argv[1] if len(sys.argv) > 1
        else "/root/testdata/sf0.01/documents.parquet")
OUT = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/golden/capstone_substr_sf001.parquet")

K = 25
MIN_COUNT = 2


def cut_spans(t: str, frequent) -> tuple:
    """Identical to gen_substr_golden.cut_spans (K differs via global)."""
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


def bigrams(t: str):
    ws = [w for w in t.strip().split() if w]
    return set(f"{a} {b}" for a, b in zip(ws, ws[1:]))


def main():
    rows = duckdb.sql(
        f"SELECT doc_id, coalesce(text, '') FROM read_parquet('{DOCS}') "
        "ORDER BY doc_id").fetchall()
    assert len(rows) >= 100, f"suspiciously small corpus: {len(rows)}"
    for _, t in rows:
        assert all(ord(c) < 0x10000 for c in t), \
            "non-BMP char: Java substring diverges"

    # stage 1: exact dedup — first doc_id per distinct text
    first = {}
    for doc_id, t in rows:
        if t not in first:
            first[t] = doc_id
    ex = [(doc_id, t) for doc_id, t in rows if first[t] == doc_id]

    # stage 2: near-dup pairs (distinct-bigram Jaccard >= 0.5) -> components
    bg = {doc_id: bigrams(t) for doc_id, t in ex if t.strip()}
    ids = sorted(bg)
    parent = {doc_id: doc_id for doc_id, _ in ex}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-id representative
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for i, a in enumerate(ids):
        sa = bg[a]
        for b in ids[i + 1:]:
            sb = bg[b]
            inter = len(sa & sb)
            denom = len(sa) + len(sb) - inter
            if denom > 0 and inter / denom >= 0.5:
                union(a, b)
    dd = [(doc_id, t) for doc_id, t in ex if find(doc_id) == doc_id]

    # stage 3: first-principles span cut over the survivor corpus
    counts = Counter()
    for _, t in dd:
        for i in range(len(t) - K + 1):
            counts[t[i:i + K]] += 1
    frequent = {w for w, n in counts.items() if n >= MIN_COUNT}

    golden = []
    for doc_id, t in dd:
        cleaned, n_spans, removed = cut_spans(t, frequent)
        golden.append((doc_id, cleaned, n_spans, removed))

    con = duckdb.connect()
    con.execute("CREATE TABLE g (doc_id BIGINT, cleaned VARCHAR, "
                "n_spans INTEGER, chars_removed INTEGER)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?, ?)", golden)
    con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
    n_hit = sum(1 for _, _, s, _ in golden if s > 0)
    total_removed = sum(r for _, _, _, r in golden)
    print(f"wrote {len(golden)} dd-survivor rows ({len(ex)} exact, "
          f"{n_hit} docs with spans, {len(frequent)} frequent windows, "
          f"{total_removed} chars cut) -> {OUT}")


if __name__ == "__main__":
    main()
