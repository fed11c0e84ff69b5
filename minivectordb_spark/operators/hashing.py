"""Deterministic, engine-portable hashing primitives.

Every dedup / fingerprint operator needs a string->int hash that is
IDENTICAL in Spark and in the DuckDB correctness oracle.  Spark's ``hash()``
(Murmur3) and DuckDB's ``hash()`` differ, so we standardize on:

    h(s) = int(md5(s)[:8 hex], 16)          -- uniform in [0, 2^32)

Spark:  ``conv(substr(md5(s), 1, 8), 16, 10)::bigint``
DuckDB: ``('0x' || substr(md5(s), 1, 8))::BIGINT``

MinHash permutations use universal hashing ``(a*h + b) mod P`` with
P = 2^31 - 1 (Mersenne) and (a, b) drawn from a seeded generator so both
engines inline the same literals.  All intermediate products stay < 2^62,
safe under Spark 4's default ANSI overflow checking.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = (1 << 31) - 1
FNV_K = 2654435761  # Knuth multiplicative constant for positional weights


def md5i32(c: Column) -> Column:
    """Deterministic 32-bit string hash as a bigint Column (JVM-side)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def md5i32_sql(expr: str) -> str:
    """The identical hash in DuckDB SQL."""
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def minhash_coeffs(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for n universal-hash permutations; the
    same literals feed the Spark expressions and the oracle SQL."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P))
        for _ in range(n_hashes)
    ]
