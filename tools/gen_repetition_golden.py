#!/usr/bin/env python3
"""Dev-time golden generator for the q78 Gopher repetition-signals oracle.

Fully independent Python re-derivation of quality.Repetition's contract
(no JVM, no shared code) — Rae et al. 2021 Table A1, all-integer:

  - the q74 4-token line wrap is replayed first (split on single space,
    groups of 4 joined by space, lines joined by newline);
  - lines = wrapped.split("\\n") (empties kept);
    n_dup_lines counts EVERY member of a line-value group of size >= 2,
    dup_line_chars sums len(line) over those occurrences,
    line_chars sums len(line) over all lines;
  - tokens = CPython str.split() (mode A);
    n_chars = len of the single-space token join;
  - top{2,3,4}_chars = count(g) * len(g) for the most frequent space-joined
    n-gram g (ties -> lexicographically smallest) WHEN g occurs >= 2
    times, else 0 (a repetition signal — unique n-grams never count);
  - dup{5..10}_chars = characters of the token join covered by any
    occurrence of an n-gram appearing >= 2 times (per-token marking; a
    joining space counts when both neighbours are covered).

The keep verdict is NOT in the golden — the oracle SQL replays it with the
same integer cross-multiplications over these columns.

Output parquet: (doc_id, n_chars, line_chars, n_lines, n_dup_lines,
dup_line_chars, top2_chars, top3_chars, top4_chars, dup5..dup10_chars).

Usage: python3 tools/gen_repetition_golden.py [documents_parquet] [out_parquet]
"""
import sys
from collections import Counter

import duckdb

DOCS = (sys.argv[1] if len(sys.argv) > 1
        else "/root/testdata/sf0.01/documents.parquet")
OUT = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/golden/repetition_sf001.parquet")


def inject(doc_id: int, text: str) -> str:
    # every 7th doc: append the first 12 single-space tokens twice (the
    # q78 query's concat_ws(" ", text, head12, head12) built-in chain)
    if doc_id % 7 != 0:
        return text
    head = " ".join(text.split(" ")[:12])
    return text + " " + head + " " + head


def wrap4(text: str) -> str:
    arr = text.split(" ")
    return "\n".join(" ".join(arr[i:i + 4]) for i in range(0, len(arr), 4))


def signals(t: str):
    lines = t.split("\n")
    lc = Counter(lines)
    n_dup = sum(1 for l in lines if lc[l] >= 2)
    dup_line_chars = sum(len(l) for l in lines if lc[l] >= 2)
    line_chars = sum(len(l) for l in lines)

    ws = t.split()
    L = len(ws)
    n_chars = sum(len(w) for w in ws) + max(0, L - 1)

    top = [0, 0, 0]
    for n in (2, 3, 4):
        if L >= n:
            grams = [" ".join(ws[j:j + n]) for j in range(L - n + 1)]
            c = Counter(grams)
            mx = max(c.values())
            if mx >= 2:
                best = min(g for g, k in c.items() if k == mx)
                top[n - 2] = mx * len(best)

    dup = [0] * 6
    for n in range(5, 11):
        if L >= n:
            grams = [" ".join(ws[j:j + n]) for j in range(L - n + 1)]
            c = Counter(grams)
            covered = [False] * L
            for j, g in enumerate(grams):
                if c[g] >= 2:
                    for k in range(j, j + n):
                        covered[k] = True
            chars = 0
            for k in range(L):
                if covered[k]:
                    chars += len(ws[k])
                    if k > 0 and covered[k - 1]:
                        chars += 1
            dup[n - 5] = chars
    return (n_chars, line_chars, len(lines), n_dup, dup_line_chars,
            *top, *dup)


def main():
    rows = duckdb.sql(
        f"SELECT doc_id, coalesce(text, '') FROM read_parquet('{DOCS}') "
        "ORDER BY doc_id").fetchall()
    assert len(rows) >= 100, f"suspiciously small corpus: {len(rows)}"

    out = [(doc_id, *signals(wrap4(inject(doc_id, t)))) for doc_id, t in rows]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE g (doc_id BIGINT, n_chars BIGINT, line_chars BIGINT, "
        "n_lines BIGINT, n_dup_lines BIGINT, dup_line_chars BIGINT, "
        "top2_chars BIGINT, top3_chars BIGINT, top4_chars BIGINT, "
        "dup5_chars BIGINT, dup6_chars BIGINT, dup7_chars BIGINT, "
        "dup8_chars BIGINT, dup9_chars BIGINT, dup10_chars BIGINT)")
    con.executemany(
        "INSERT INTO g VALUES (?,?,?,?,?,?,?,?,?,?,?,?,?,?,?)", out)
    con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
    n_rep = sum(1 for r in out if r[4] > 0 or any(r[9:]))
    print(f"wrote {len(out)} rows -> {OUT}  (docs with any repetition: {n_rep})")


if __name__ == "__main__":
    main()
