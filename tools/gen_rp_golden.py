#!/usr/bin/env python3
"""Dev-time golden generator for the q85 RedPajama-V2 residual-signals oracle.

Fully independent Python re-derivation of quality.RpSignals' contract
(no JVM, no shared code) — the RedPajama-Data-v2 signal families not
already covered by the Gopher (q78) / C4 (q81) / heuristic (q14) suites:

  - the q85 injection chain is replayed first, in the query's exact
    precedence order (every branch of every signal needs real rows —
    the corpus is lowercase punctuation-free word bags):
      %17 -> the first token repeated 40x (low entropy),
      elif %23 -> a numeric-only doc;
      %19 -> whole-doc upper, elif %5 -> two appended upper tokens;
      %7 -> appended numeric tokens " 404 5050";
      %13 -> appended blocked words;
      %11 -> a leading bullet token "• ";
      the 4-token line wrap;
      %29 -> "• " prefixed to every line;
      %31 -> " ..." appended to every line, elif %41 -> to the text end.
  - lines = wrapped.split("\n") (empties kept); ellipsis lines end with
    "..." or the U+2026 char; bullet lines start with one of •‣▶◦*-.
  - words = CPython str.split() (mode A; '\n' is whitespace);
    all_caps replicates str.isupper() over ASCII (>=1 A-Z, no a-z);
    no_alph = no ASCII letter; list hits compare the ASCII-lowered word.
  - unigram entropy in integer micro-nats: micro(x) = floor(ln(x)*1e6+0.5)
    over INTEGER word counts only (math.log == Java Math.log here), and
      ent_micro = micro(N) - (sum_w c_w * micro(c_w)) // N
    (all terms non-negative, so // == the JVM's Long division).

The keep verdict is NOT in the golden — the oracle SQL replays it with
the same integer cross-multiplications over these columns.

Output parquet: (doc_id, n_words, n_unique, ent_micro, n_allcaps,
n_noalph, n_lines, ellipsis_lines, bullet_lines, list_hits).

Usage: python3 tools/gen_rp_golden.py [documents_parquet] [out_parquet]
"""
import math
import sys
from collections import Counter

import duckdb

DOCS = (sys.argv[1] if len(sys.argv) > 1
        else "/root/testdata/sf0.01/documents.parquet")
OUT = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/golden/rpv2_sf001.parquet")

BULLETS = set("•‣▶◦*-")
BLOCKED = {"blockedalpha", "blockedbeta"}


def inject(doc_id: int, text: str) -> str:
    toks = text.split(" ")
    assert len(toks) >= 2, f"doc {doc_id} too short for the %5 injection"
    if doc_id % 17 == 0:
        t = " ".join([toks[0]] * 40)
    elif doc_id % 23 == 0:
        t = "7 49 343 2401 7 49 343 2401 16807"
    else:
        t = text
    if doc_id % 19 == 0:
        t = t.upper()
    elif doc_id % 5 == 0:
        t = t + " " + (toks[0] + " " + toks[1]).upper()
    if doc_id % 7 == 0:
        t = t + " 404 5050"
    if doc_id % 13 == 0:
        t = t + " blockedalpha blockedbeta blockedalpha"
    if doc_id % 11 == 0:
        t = "• " + t
    arr = t.split(" ")
    lines = [" ".join(arr[i:i + 4]) for i in range(0, len(arr), 4)]
    wrapped = "\n".join(lines)
    if doc_id % 29 == 0:
        wrapped = "\n".join("• " + l for l in wrapped.split("\n"))
    if doc_id % 31 == 0:
        wrapped = "\n".join(l + " ..." for l in wrapped.split("\n"))
    elif doc_id % 41 == 0:
        wrapped = wrapped + " ..."
    return wrapped


def micro(x: int) -> int:
    return int(math.floor(math.log(x) * 1e6 + 0.5))


def ascii_lower(w: str) -> str:
    return "".join(chr(ord(c) + 32) if "A" <= c <= "Z" else c for c in w)


def signals(t: str):
    lines = t.split("\n")
    ell = sum(1 for l in lines if l.endswith("...") or l.endswith("…"))
    bul = sum(1 for l in lines if l and l[0] in BULLETS)

    ws = t.split()
    n = len(ws)
    c = Counter(ws)
    allcaps = sum(1 for w in ws
                  if any("A" <= ch <= "Z" for ch in w)
                  and not any("a" <= ch <= "z" for ch in w))
    noalph = sum(1 for w in ws
                 if not any(("a" <= ch <= "z") or ("A" <= ch <= "Z")
                            for ch in w))
    hits = sum(1 for w in ws if ascii_lower(w) in BLOCKED)
    sum_c = sum(k * micro(k) for k in c.values())
    ent = micro(n) - sum_c // n if n > 0 else 0
    return (n, len(c), ent, allcaps, noalph, len(lines), ell, bul, hits)


def main():
    rows = duckdb.sql(
        f"SELECT doc_id, coalesce(text, '') FROM read_parquet('{DOCS}') "
        "ORDER BY doc_id").fetchall()
    assert len(rows) >= 100, f"suspiciously small corpus: {len(rows)}"

    out = [(doc_id, *signals(inject(doc_id, t))) for doc_id, t in rows]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE g (doc_id BIGINT, n_words BIGINT, n_unique BIGINT, "
        "ent_micro BIGINT, n_allcaps BIGINT, n_noalph BIGINT, "
        "n_lines BIGINT, ellipsis_lines BIGINT, bullet_lines BIGINT, "
        "list_hits BIGINT)")
    con.executemany("INSERT INTO g VALUES (?,?,?,?,?,?,?,?,?,?)", out)
    con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")

    # branch-distribution sanity: every rule must have passing AND failing
    # rows, or the oracle proves nothing about that branch
    def frac_fail(pred):
        return sum(1 for r in out if pred(r))
    n = len(out)
    fails = {
        "entropy": frac_fail(lambda r: r[3] < 2000000),
        "unique": frac_fail(lambda r: r[2] * 100 < 10 * max(1, r[1])),
        "allcaps": frac_fail(lambda r: r[4] * 100 > 10 * max(1, r[1])),
        "noalph": frac_fail(lambda r: r[5] * 100 > 20 * max(1, r[1])),
        "ellipsis": frac_fail(lambda r: r[7] * 100 > 30 * max(1, r[6])),
        "bullet": frac_fail(lambda r: r[8] * 100 > 50 * max(1, r[6])),
        "blocked": frac_fail(lambda r: r[9] > 0),
    }
    print(f"wrote {n} rows -> {OUT}")
    for k, v in fails.items():
        print(f"  rule {k}: {v} failing docs")
        assert 0 < v < n, f"rule {k} has no branch coverage ({v}/{n})"


if __name__ == "__main__":
    main()
