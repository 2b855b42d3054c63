"""Cross-engine-stable hashing.

Engine-native hash functions differ between Spark (``xxhash64``) and the
DuckDB oracle (``hash``), so every operator that needs a string->int hash
(minhash, simhash, LSH bucketing) derives it from ``md5`` hex — identical in
both engines — parsed as a 60-bit integer.  All helpers come in pairs: a
Spark ``Column`` builder and a SQL-string builder for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 60-bit md5 prefix: fits a signed int64 in both engines, always positive.
_HEX_DIGITS = 15

# Mersenne prime 2^61-1 — modulus for the minhash permutation family.
MERSENNE61 = (1 << 61) - 1


def md5_int(col: Column) -> Column:
    """Stable 60-bit integer hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, _HEX_DIGITS), 16, 10).cast("long")


def md5_int_sql(expr: str) -> str:
    """Same hash for the DuckDB oracle. DuckDB parses 0x-prefixed strings."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, {_HEX_DIGITS})) AS BIGINT)"


def perm_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) parameters for k minhash permutations
    h_i(x) = (a_i * x + b_i) mod (2^61 - 1).

    Derived from a fixed linear congruence (not runtime randomness) so Spark,
    the oracle SQL, and re-runs all agree.
    """
    params = []
    a, b = 0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F
    for i in range(k):
        a_i = (a * (2 * i + 1) + 17) % MERSENNE61
        b_i = (b * (i + 1) + 31) % MERSENNE61
        params.append((a_i or 1, b_i))
    return params


def minhash_col(hash_col: Column, a: int, b: int) -> Column:
    """One permuted hash (Spark). Kept in int64 range: a,b < 2^61 but a*x can
    overflow int64, so reduce x mod 2^31 first — still uniform enough for
    minhash banding and, critically, reproducible in SQL."""
    x = hash_col % F.lit(2147483647)
    return (F.lit(a % 1000003) * x + F.lit(b % 1000003)) % F.lit(MERSENNE61)


def minhash_sql(hash_expr: str, a: int, b: int) -> str:
    """Oracle-side mirror of :func:`minhash_col`."""
    return (
        f"(({a % 1000003} * (({hash_expr}) % 2147483647) + {b % 1000003})"
        f" % {MERSENNE61})"
    )
