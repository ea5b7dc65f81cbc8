#!/usr/bin/env python3
"""Dev-time golden generator for the q93 pseudonymized-rewrite oracle.

Fully independent Python re-derivation of transcript.Pseudonymize.rewrite's
contract (no JVM, no shared code): over the committed raw transcript dump,

  1. extract entities per kind in scrub-chain order (url, email, ssn,
     credit_card, phone, ipv4), each kind matching on the text with the
     previous kinds replaced by their FLAT masks;
  2. assign conversation-stable aliases [KIND_i] per distinct
     (conv_id, kind, entity), numbered by first appearance in
     (turn_idx, within-turn match ordinal) order;
  3. rewrite every turn: kind i's matches (found on the text with kinds
     1..i-1 already alias-rewritten) replaced by their aliases, then the
     toxicity lexicon flat-masked [REDACTED] at its chain position;
  4. n_aliased = total alias substitutions across the six kinds.

The patterns are written here verbatim from the public scrub spec
(graft/scrub/Scrubber.scala documents them; they are the common
Java/Python-`re` behavior subset on this ASCII-PII corpus — the oracle
comparison itself proves the parity every run).

Output parquet: (conv_id, turn_idx, scrubbed, n_aliased).

Usage: python3 tools/gen_pseudo_golden.py [turns_raw_parquet] [out_parquet]
Prerequisite: src/test/resources/golden/turns_raw_sf001.parquet (written by
`sbt "Test/runMain graft.GoldenTurnsRaw"`).
"""
import re
import sys

import duckdb

RAW = (sys.argv[1] if len(sys.argv) > 1
       else "src/test/resources/golden/turns_raw_sf001.parquet")
OUT = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/golden/pseudo_sf001.parquet")

KINDS = [
    ("url", re.compile(r"""https?://[^\s<>"']+"""), "[URL]"),
    ("email",
     re.compile(r"""\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"""),
     "[EMAIL]"),
    ("ssn", re.compile(r"""\b\d{3}-\d{2}-\d{4}\b"""), "[SSN]"),
    ("credit_card",
     re.compile(r"""\b(?:\d{4}[ -]){3}\d{4}\b|\b\d{15,16}\b"""), "[CC]"),
    ("phone",
     re.compile(r"""(?:\(\d{3}\)\s?|\b\d{3}[-.])\d{3}[-.]\d{4}\b"""),
     "[PHONE]"),
    ("ipv4", re.compile(r"""\b(?:\d{1,3}\.){3}\d{1,3}\b"""), "[IP]"),
]
TOX = re.compile(
    r"\b(?:frakking|gorram|smegging|feldercarb|dren|frell)\b", re.IGNORECASE)


def main():
    rows = duckdb.sql(
        f"SELECT conv_id, turn_idx, text FROM read_parquet('{RAW}') "
        "ORDER BY conv_id, turn_idx").fetchall()

    # pass 1: alias assignment per conversation, first-appearance order
    # alias[(conv, kind, entity)] = [KIND_i]
    alias = {}
    next_idx = {}  # (conv, kind) -> next index
    for conv_id, turn_idx, text in rows:
        if text is None:
            continue
        cur = text
        for kind, pat, mask in KINDS:
            for m in pat.finditer(cur):
                key = (conv_id, kind, m.group(0))
                if key not in alias:
                    i = next_idx.get((conv_id, kind), 0) + 1
                    next_idx[(conv_id, kind)] = i
                    alias[key] = f"[{kind.upper()}_{i}]"
            cur = pat.sub(mask, cur)

    # pass 2: rewrite with aliases (chain order), then flat toxicity mask
    out = []
    for conv_id, turn_idx, text in rows:
        if text is None:
            out.append((conv_id, turn_idx, None, 0))
            continue
        cur = text
        n = 0

        for kind, pat, mask in KINDS:
            def sub(m):
                nonlocal n
                n += 1
                return alias.get((conv_id, kind, m.group(0)), mask)
            cur = pat.sub(sub, cur)
        cur = TOX.sub("[REDACTED]", cur)
        out.append((conv_id, turn_idx, cur, n))

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE g (conv_id VARCHAR, turn_idx INTEGER, "
        "scrubbed VARCHAR, n_aliased INTEGER)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?, ?)", out)
    con.execute(f"COPY (SELECT * FROM g ORDER BY conv_id, turn_idx) "
                f"TO '{OUT}' (FORMAT PARQUET)")
    n_alias = len(alias)
    n_sub = sum(r[3] for r in out)
    print(f"wrote {len(out)} rows, {n_alias} distinct entities, "
          f"{n_sub} substitutions to {OUT}")


if __name__ == "__main__":
    main()
