#!/usr/bin/env python3
"""Dev-time golden generator for the q36 approx-distinct oracle.

Independent (non-JVM) re-derivation of Spark's HyperLogLog++ estimate for
`approx_count_distinct(l_partkey, 0.02)` over the sf0.01 lineitem table,
from the public algorithm (Heule/Nunkesser/Hall, EDBT'13) with Spark's
published parameterization:

  p        = ceil(2·log2(1.106 / rsd))  -> 12 for rsd = 0.02 (m = 4096)
  hash     = XXH64 of the 8-byte little-endian long, seed 42
  register = hash >>> (64 - p)
  estimate = linear counting when V (empty registers) > 0 and
             H = m·ln(m/V) <= THRESHOLDS(p-4) (= 3100 for p=12, the
             paper's empirically-derived cutoff), result Math.round(H)

At sf0.01 the column has ~2000 distinct keys against 4096 registers, so
the estimate provably takes the linear-counting branch — which depends
only on WHICH registers are hit, not on the leading-zero ranks or the
bias-correction tables. The tool asserts it is on that branch and fails
loudly otherwise (a scale change that left linear counting would need the
paper's bias tables re-derived here too).

The exact countDistinct half of the q36 row is computed by DuckDB in the
same oracle query; this golden pins only the sketch estimate.

Usage: python3 tools/gen_hll_golden.py [sf_dir] [out_parquet]
"""
import math
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/golden/hll_sf001.parquet")

M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

# p = 12 thresholds index p-4 = 8; the HLL++ paper's empirical cutoffs
THRESHOLD_P12 = 3100.0


def rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M64


def xxh64_long(value: int, seed: int = 42) -> int:
    """Spark XXH64.hashLong: the 8-byte-input specialization of XXH64."""
    lane = value & M64  # the long's little-endian bytes as unsigned
    h = (seed + P5 + 8) & M64
    k1 = (rotl((lane * P2) & M64, 31) * P1) & M64
    h ^= k1
    h = (rotl(h, 27) * P1 + P4) & M64
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def main():
    rsd = 0.02
    p = math.ceil(2.0 * math.log(1.106 / rsd) / math.log(2.0))
    assert p == 12, p
    m = 1 << p

    rows = duckdb.sql(
        f"SELECT DISTINCT l_partkey FROM read_parquet('{SF}/lineitem.parquet') "
        "WHERE l_partkey IS NOT NULL").fetchall()
    exact = len(rows)
    hit = {xxh64_long(v) >> (64 - p) for (v,) in rows}
    v_empty = m - len(hit)
    assert v_empty > 0, "no empty registers — linear counting not applicable"
    h = m * math.log(m / v_empty)
    assert h <= THRESHOLD_P12, (
        f"H={h} above the p=12 threshold — estimate would take the "
        "bias-corrected branch; extend this tool with the paper's tables")
    approx = math.floor(h + 0.5)  # Java Math.round(double)

    con = duckdb.connect()
    con.execute("CREATE TABLE g (approx_parts BIGINT)")
    con.execute("INSERT INTO g VALUES (?)", [approx])
    con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
    print(f"exact={exact} hit_registers={len(hit)} V={v_empty} "
          f"H={h:.3f} approx={approx} -> {OUT}")


if __name__ == "__main__":
    main()
