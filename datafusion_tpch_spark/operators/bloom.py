"""Bloom-filter semi-join prefilter.

The classic distributed-join optimization: build a small bit-set from the
(filtered) build side's join keys, broadcast it, and drop probe-side rows
whose keys cannot possibly match *before* the shuffle/join — then run the
exact join on the survivors to eliminate false positives.  Result rows are
identical to the plain join; the bloom pass only cuts the data volume that
reaches the join, which at 100 TB is the difference between shuffling the
whole fact table and shuffling the ~selectivity fraction of it.

Spark has a native version of this idea (runtime bloom-filter join,
``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled``) that only fires
under cost heuristics; this operator is the explicit, deterministic form —
and every expression is JVM-side (xxhash64 + bit arithmetic), no Python UDFs.

Design constraints:
- The filter is a fixed ``m_bits`` bit-set packed into 64-bit words.  The
  driver collect is bounded at ``m_bits / 64`` rows (constant,
  corpus-size independent — same rule as the fixed-k IVF centroids).
- Hash positions derive from Spark's native xxhash64 (seeded per position),
  deterministic across runs; correctness never depends on the hash (the
  exact join removes false positives), so the cheapest JVM hash wins.
- k defaults to 3 probes: measured 2.6x faster than k=4 over 32-bit words
  at sf0.1 (fewer element_at lookups, half-sized literal array), and the
  extra false-positive fraction only feeds the exact re-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_WORD_BITS = 64
_WORD_SHIFT = 6  # log2(_WORD_BITS)


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bloom bit positions for a key column (xxhash64-derived, JVM-side).

    xxhash64 over md5: ~10x cheaper per row (no hex/conv round-trip) and
    the exact re-join removes false positives regardless of hash choice,
    so cross-engine hash stability buys nothing here.  Each position
    salts the hash with its index as an extra hashed column.
    """
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def _bit_mask(pos: Column) -> Column:
    """``1L << (pos % 64)`` — shiftleft with a *column* shift amount
    (the Python wrapper's int-only signature is narrower than the SQL
    function, so call it by name)."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), (pos % _WORD_BITS).cast("int")
    )


def bloom_build(build: DataFrame, key: Column, m_bits: int = 1 << 15,
                k: int = 3) -> list[int]:
    """Aggregate the build side's keys into a packed bloom bit-set.

    One explode (k rows per key) + one hash aggregation on the word index,
    then a driver collect bounded at ``m_bits / 64`` rows.  Returns the
    dense word list (length ``m_bits / 64``, zeros included).
    """
    pos = F.explode(F.array(*_positions(key, m_bits, k))).alias("pos")
    pairs = (
        build.select(pos)
        .select(
            F.shiftright(F.col("pos"), _WORD_SHIFT).cast("int").alias("word"),
            _bit_mask(F.col("pos")).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or(F.col("mask")).alias("mask"))
        .collect()
    )
    words = [0] * (m_bits // _WORD_BITS)
    for r in pairs:
        words[r["word"]] = r["mask"]
    return words


def bloom_might_contain(words: list[int], key: Column, m_bits: int = 1 << 15,
                        k: int = 3) -> Column:
    """Membership predicate over a built filter — pure column expressions.

    The word list enters the plan as one constant array literal
    (``m_bits / 64`` elements); each probe row computes k xxhash64
    positions and ANDs the corresponding bit tests.  False positives
    possible (callers must re-join exactly), false negatives impossible.
    """
    arr = F.lit(words).cast("array<long>")
    checks = []
    for pos in _positions(key, m_bits, k):
        word = F.element_at(arr, F.shiftright(pos, _WORD_SHIFT).cast("int") + 1)
        checks.append(word.bitwiseAND(_bit_mask(pos)) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_semi_join(probe: DataFrame, build: DataFrame, probe_key: str,
                    build_key: str, m_bits: int = 1 << 15, k: int = 3,
                    ) -> DataFrame:
    """Exact semi-join with a bloom prefilter on the probe side.

    Row-identical to ``probe.join(build, probe_key == build_key,
    "left_semi")`` — the bloom pass is performance-only.
    """
    words = bloom_build(build, F.col(build_key), m_bits, k)
    pre = probe.filter(bloom_might_contain(words, F.col(probe_key), m_bits, k))
    return pre.join(
        build.select(F.col(build_key).alias(probe_key)).distinct(),
        probe_key,
        "left_semi",
    )
