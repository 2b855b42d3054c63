"""Exact (order-independent, cross-engine-deterministic) aggregation.

Summing doubles is order-dependent, and Spark and the DuckDB oracle reduce
in different orders — a plain ``SUM(double)`` differs in the last ulps and
fails the driver's value-hash comparison.  Rounding ``double -> decimal``
is also engine-dependent (Spark rounds the exact binary expansion HALF_UP;
DuckDB scales in floating point), so casting isn't safe either.

The scheme used everywhere here:

1. per-row arithmetic stays in double — bit-identical across engines for
   the same expression tree;
2. the row value is quantized with ``floor(x * 10^8)`` — floor is exact on
   doubles, so both engines get the same integer;
3. integers are summed in DECIMAL(38,0) — exact, order-independent, no
   overflow until ~1e38 (safe at 100 TB);
4. the sum is scaled back to double.

The aggregate is therefore a deterministic fixed-point sum with quantum
1e-8 — well inside float tolerance for analytics, and *identical* on both
sides of the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 8
_Q = float(10**SCALE)


def dsum(col: Column) -> Column:
    """Order-independent, engine-stable SUM of a double expression."""
    q = F.floor(col.cast("double") * F.lit(_Q)).cast("decimal(38,0)")
    return (F.sum(q).cast("double") / F.lit(_Q)).alias("dsum")


def dsum_sql(expr: str) -> str:
    return (
        f"(CAST(SUM(CAST(floor(CAST(({expr}) AS DOUBLE) * {_Q:.1f}) AS DECIMAL(38,0)))"
        f" AS DOUBLE) / {_Q:.1f})"
    )


def davg(col: Column) -> Column:
    """Order-independent AVG: quantized exact sum divided by count."""
    return dsum(col) / F.count(col)


def davg_sql(expr: str) -> str:
    return f"({dsum_sql(expr)} / COUNT({expr}))"


def dsum_q(col: Column) -> Column:
    """Quantized DECIMAL(38,0) partial sum of a double expression.

    Decimal addition is exact and associative, so partial sums produced by
    this aggregate can be re-summed at a coarser grouping (or in a window)
    and ``unq`` of the result is bit-identical to ``dsum`` computed over
    the finer rows directly — the re-aggregation identity the single-pass
    query rewrites rely on."""
    return F.sum(F.floor(col.cast("double") * F.lit(_Q)).cast("decimal(38,0)"))


def unq(col: Column) -> Column:
    """Scale a quantized decimal (partial) sum back to double — ``dsum``'s
    final step, split out so re-aggregated ``dsum_q`` sums finish the same
    way."""
    return col.cast("double") / F.lit(_Q)


def dsum_weighted(col: Column, weight: Column) -> Column:
    """``dsum`` of a value repeated ``weight`` times (weight: integer
    count column).  Quantization happens per distinct value and
    decimal × integer multiplication is exact, so this is bit-identical
    to ``dsum`` over the expanded rows — the identity that lets audits
    re-aggregate a distinct-value counts table instead of rescanning the
    source (pinned in tests/test_selection_algebra.py)."""
    q = F.floor(col.cast("double") * F.lit(_Q)).cast("decimal(38,0)")
    return F.sum(q * weight).cast("double") / F.lit(_Q)


def davg_over(col: Column, w) -> Column:
    """Window form of ``davg``: same quantize → decimal-sum → scale → /count
    expression tree per window partition, so values are bit-identical to a
    groupBy ``davg`` joined back on the partition key — without a second
    evaluation of the input subtree."""
    q = F.floor(col.cast("double") * F.lit(_Q)).cast("decimal(38,0)")
    return (F.sum(q).over(w).cast("double") / F.lit(_Q)) / F.count(col).over(w)
