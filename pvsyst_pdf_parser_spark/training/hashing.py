"""Portable deterministic hashing shared by dedup/fingerprint operators.

Spark's hash()/xxhash64() are engine-specific; the DuckDB oracles need
bit-identical values.  Both engines expose md5(string) → hex, so the
common 56-bit hash is int(md5[:14], 16):

  Spark :  cast(conv(substr(md5(s), 1, 14), 16, 10) as bigint)
  DuckDB:  ('0x' || substr(md5(s), 1, 14))::bigint

Min-hash permutations are universal hashes (a_j·h + b_j) mod P with
P = 2^31 - 1; h is first reduced mod P so the 64-bit product cannot
overflow.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = (1 << 31) - 1

# deterministic permutation parameters (j = 0..n-1)
def perm_params(n: int) -> list[tuple[int, int]]:
    return [((j * 2 + 1) * 2654435761 % MERSENNE_P, (j * j + j + 7) % MERSENNE_P)
            for j in range(n)]


def md5_56(col: Column) -> Column:
    """56-bit integer hash of a string column (portable to DuckDB)."""
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("bigint")


def md5_56_sql(expr: str) -> str:
    """DuckDB SQL for the same hash."""
    return f"(('0x' || substr(md5({expr}), 1, 14))::bigint)"


def minhash_value(h_mod_p: Column, a: int, b: int) -> Column:
    return (F.lit(a) * h_mod_p + F.lit(b)) % F.lit(MERSENNE_P)


def minhash_value_sql(h_expr: str, a: int, b: int) -> str:
    return f"(({a} * {h_expr} + {b}) % {MERSENNE_P})"
