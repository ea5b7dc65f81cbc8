#!/usr/bin/env python3
"""Dev-time golden generator for the q79 compression-ratio oracle.

Independent Python re-derivation of quality.Compressibility's contract:
n_bytes = UTF-8 length, z_bytes = len(zlib.compress(utf8, 6)). CPython's
zlib and the JDK's Deflater emit BYTE-IDENTICAL deflate streams at the
same level (both bundle canonical madler zlib; verified on the full
sf0.01 corpus plus megabyte-scale mixed/repetitive/patterned inputs), so
the lengths match exactly. The keep verdict is NOT in the golden — the
oracle SQL replays the integer ratio band over these columns.

Output parquet: (doc_id, n_bytes, z_bytes).

Usage: python3 tools/gen_compress_golden.py [documents_parquet] [out_parquet]
"""
import sys
import zlib

import duckdb

DOCS = (sys.argv[1] if len(sys.argv) > 1
        else "/root/testdata/sf0.01/documents.parquet")
OUT = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/golden/compress_sf001.parquet")


def main():
    rows = duckdb.sql(
        f"SELECT doc_id, coalesce(text, '') FROM read_parquet('{DOCS}') "
        "ORDER BY doc_id").fetchall()
    assert len(rows) >= 100, f"suspiciously small corpus: {len(rows)}"

    out = []
    for doc_id, t in rows:
        b = t.encode("utf-8")
        out.append((doc_id, len(b), len(zlib.compress(b, 6))))

    con = duckdb.connect()
    con.execute("CREATE TABLE g (doc_id BIGINT, n_bytes BIGINT, z_bytes BIGINT)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?)", out)
    con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
    lo = sum(1 for _, n, z in out if n >= 64 and z * 100 < 30 * n)
    print(f"wrote {len(out)} rows -> {OUT}  (below-floor docs: {lo})")


if __name__ == "__main__":
    main()
