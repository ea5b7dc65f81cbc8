#!/usr/bin/env python3
"""Dev-time golden generator for the q81 C4 line-filter oracle.

Fully independent Python re-derivation of quality.LineFilters' contract
(no JVM, no shared code) — Raffel et al. 2020 §2.2 line rules over the
q74 4-token wrap, with the q81 injections replayed first:

  - doc_id % 11 == 0 -> text + " Lorem IPSUM dolor"
  - else doc_id % 13 == 0 -> text + " some {code} block"
  - lines: the 4-token wrap with a terminal "." appended to every OTHER
    line (0-based even line index) — the corpus is punctuation-free, so
    the kept path needs synthesized sentences;
  - doc_id % 17 == 0 -> append the line
    "Please enable javascript right now." (the line-drop rule);
  - line keep: non-empty AND ends in one of . ! ? " ' AND >= 3 CPython
    str.split tokens AND ASCII-lowercased line does not contain
    "javascript";
  - doc drop order: "lorem_ipsum" (ASCII-lowercased text contains
    "lorem ipsum") -> "brace" ("{" present) -> "too_few_lines"
    (< 3 surviving lines); drop_reason NULL when kept;
  - cleaned = surviving lines joined by newline (emitted even for drops).

ASCII-only case fold (A-Z only) on BOTH sides — no locale semantics.

Output parquet: (doc_id, cleaned, n_lines_in, n_lines_kept, drop_reason).
doc_keep is replayed in SQL as (drop_reason IS NULL).

Usage: python3 tools/gen_c4filter_golden.py [documents_parquet] [out_parquet]
"""
import sys

import duckdb

DOCS = (sys.argv[1] if len(sys.argv) > 1
        else "/root/testdata/sf0.01/documents.parquet")
OUT = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/golden/c4filter_sf001.parquet")

TERMINAL = set('.!?"\'')
LOWER = str.maketrans({chr(c): chr(c + 32) for c in range(ord('A'), ord('Z') + 1)})


def ascii_lower(s: str) -> str:
    return s.translate(LOWER)


def inject(doc_id: int, t: str) -> str:
    if doc_id % 11 == 0:
        return t + " Lorem IPSUM dolor"
    if doc_id % 13 == 0:
        return t + " some {code} block"
    return t


def to_lines(doc_id: int, text: str) -> str:
    arr = text.split(" ")
    lines = [" ".join(arr[k:k + 4]) + ("." if (k // 4) % 2 == 0 else "")
             for k in range(0, len(arr), 4)]
    out = "\n".join(lines)
    if doc_id % 17 == 0:
        out += "\nPlease enable javascript right now."
    return out


def filt(t: str):
    lower = ascii_lower(t)
    lines = t.split("\n")
    kept = [l for l in lines
            if l and l[-1] in TERMINAL and len(l.split()) >= 3
            and "javascript" not in ascii_lower(l)]
    cleaned = "\n".join(kept)
    if "lorem ipsum" in lower:
        reason = "lorem_ipsum"
    elif "{" in t:
        reason = "brace"
    elif len(kept) < 3:
        reason = "too_few_lines"
    else:
        reason = None
    return cleaned, len(lines), len(kept), reason


def main():
    rows = duckdb.sql(
        f"SELECT doc_id, coalesce(text, '') FROM read_parquet('{DOCS}') "
        "ORDER BY doc_id").fetchall()
    assert len(rows) >= 100, f"suspiciously small corpus: {len(rows)}"

    out = [(doc_id, *filt(to_lines(doc_id, inject(doc_id, t)))) for doc_id, t in rows]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE g (doc_id BIGINT, cleaned VARCHAR, n_lines_in BIGINT, "
        "n_lines_kept BIGINT, drop_reason VARCHAR)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?, ?, ?)", out)
    con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
    from collections import Counter
    print(f"wrote {len(out)} rows -> {OUT}  "
          f"(reasons: {Counter(r[4] for r in out)})")


if __name__ == "__main__":
    main()
