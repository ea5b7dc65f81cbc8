#!/usr/bin/env python3
"""Dev-time golden generator for the q64 learned-BPE oracle.

Fully independent Python re-derivation of text.Bpe's train+encode contract
from first principles (no JVM, no shared code):

  - pre-tokenize: maximal letter runs | maximal digit runs | single other
    non-whitespace chars (the corpus is asserted ASCII, so `str.isalpha` /
    `str.isdigit` over ASCII equal Java's \\p{L} / \\p{N}, and the ASCII
    whitespace set equals Java regex \\s);
  - train: weighted pair counts over the (word, count) vocabulary; per
    round pick the highest-count pair, ties broken by the lexicographically
    smallest (left, right); merge left-to-right non-overlapping; stop at
    N_MERGES or when the best count < MIN_PAIR_COUNT;
  - encode: repeatedly merge the present pair with the LOWEST rank,
    left-to-right non-overlapping, until none remains.

Output parquet: (doc_id, n_bpe_tokens, bpe_text) where bpe_text is the
space-joined token sequence (pre-tokens never contain whitespace).

Usage: python3 tools/gen_bpe_golden.py [documents_parquet] [out_parquet]
"""
import sys
from collections import Counter

import duckdb

DOCS = (sys.argv[1] if len(sys.argv) > 1
        else "/root/testdata/sf0.01/documents.parquet")
OUT = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/golden/bpe_sf001.parquet")

N_MERGES = 50  # below the ~89-merge dry-out of this corpus's 31-word vocab,
# so the merge RANK ORDER stays observable in the encoded output (at full
# dry-out every word is one token and any merge order looks identical)
MIN_PAIR_COUNT = 2
SPACE = set(" \t\n\x0b\f\r")


def pretokenize(t: str):
    out = []
    i, n = 0, len(t)
    while i < n:
        c = t[i]
        if c.isalpha():
            j = i + 1
            while j < n and t[j].isalpha():
                j += 1
            out.append(t[i:j])
            i = j
        elif c.isdigit():
            j = i + 1
            while j < n and t[j].isdigit():
                j += 1
            out.append(t[i:j])
            i = j
        elif c in SPACE:
            i += 1
        else:
            out.append(c)
            i += 1
    return out


def apply_merge(syms, a, b):
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train(word_counts):
    words = [([c for c in w], n) for w, n in sorted(word_counts.items())]
    merges = []
    for _ in range(N_MERGES):
        pc = Counter()
        for syms, n in words:
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < MIN_PAIR_COUNT:
            break
        a, b = best[0]
        merges.append((a, b))
        words = [(apply_merge(syms, a, b), n) for syms, n in words]
    return merges


def encode_word(w, ranks):
    syms = [c for c in w]
    while len(syms) > 1:
        best_rank, best = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (syms[i], syms[i + 1])
        if best is None:
            break
        syms = apply_merge(syms, *best)
    return syms


def main():
    rows = duckdb.sql(
        f"SELECT doc_id, coalesce(text, '') FROM read_parquet('{DOCS}') "
        "ORDER BY doc_id").fetchall()
    assert len(rows) >= 100, f"suspiciously small corpus: {len(rows)}"
    for _, t in rows:
        assert all(ord(c) < 128 for c in t), \
            "non-ASCII char: the simple isalpha/isdigit scanner and the " \
            "lexicographic tie-break are only proven equal to the JVM for ASCII"

    word_counts = Counter()
    for _, t in rows:
        word_counts.update(pretokenize(t))
    merges = train(word_counts)
    ranks = {m: i for i, m in enumerate(merges)}

    memo = {}
    golden = []
    for doc_id, t in rows:
        toks = []
        for w in pretokenize(t):
            if w not in memo:
                memo[w] = encode_word(w, ranks)
            toks.extend(memo[w])
        golden.append((doc_id, len(toks), " ".join(toks)))

    con = duckdb.connect()
    con.execute("CREATE TABLE g (doc_id BIGINT, n_bpe_tokens INTEGER, "
                "bpe_text VARCHAR)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?)", golden)
    con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
    total = sum(n for _, n, _ in golden)
    print(f"wrote {len(golden)} rows ({len(merges)} merges learned, "
          f"{total} tokens total, vocab {len(word_counts)}) -> {OUT}")


if __name__ == "__main__":
    main()
