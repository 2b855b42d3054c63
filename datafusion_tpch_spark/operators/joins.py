"""Temporal join operators Spark lacks as built-ins: as-of join and
range (interval-overlap) join.

The reference engine's ecosystem (DataFusion) offers neither as a named
operator; both are staples of event/feature pipelines, so they are
implemented here as compositions of existing DataFrame ops — no Python
UDFs, no driver materialization — with the plan shapes that survive a
1000-executor cluster:

- **as-of join** — the naive formulation is a per-row "latest right row
  with ts <= left.ts" correlated subquery, i.e. an O(n·m) range join.
  The scale-safe plan used here is the *union + carry-forward window*:
  tag both inputs, union them, and run one ``last(..., ignorenulls=True)``
  window per key ordered by time.  Cost = ONE hash shuffle on the join
  key (identical to sessionization), regardless of how many right rows
  precede each left row.
- **range join** — Spark executes ``t1.ts BETWEEN t2.lo AND t2.hi`` as
  BroadcastNestedLoopJoin (small right) or a cartesian product; both die
  when the right side stops fitting or n·m explodes.  The scale-safe plan
  *bucketizes* the time axis: each interval explodes to the fixed-width
  buckets it overlaps, each probe row maps to exactly one bucket, and the
  join becomes an equi-join on (keys…, bucket) followed by the exact
  range predicate.  Replication factor = O(interval_len / bucket_width),
  chosen by the caller; the join shuffles hash-uniformly instead of
  nested-looping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    order_col: str,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join: for every left row, attach the columns
    of the latest right row with the same ``on`` keys and
    ``right.right_ts <= left.left_ts`` (ties at equal timestamps match —
    the right row sorts first).

    ``order_col`` must exist in both inputs and break timestamp ties
    deterministically (an event id); among equal-timestamp right rows the
    one with the greatest ``order_col`` wins.  ``tolerance_us`` nulls the
    match out when the right row is more than that many microseconds old.

    Returns all of ``left``'s columns plus ``right_cols`` (null where no
    right row qualifies).  One hash shuffle on ``on``; no range join.
    """
    carried = [f"_r_{c}" for c in right_cols]
    if "_r_ts" in right_cols or set(carried) & set(left.columns):
        raise ValueError("column name collision with _r_ prefix")

    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.col(order_col).alias("_ord"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast("long").alias("_r_us"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(a)
            for c, a in zip(right_cols, carried)
        ],
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.col(order_col).alias("_ord"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        F.unix_micros(F.col(right_ts)).alias("_r_us"),
        *[F.col(c).alias(a) for c, a in zip(right_cols, carried)],
    )

    # right rows (_is_left=0) sort before left rows at equal _ts, so the
    # carry-forward window sees same-instant right rows — backward-inclusive
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_is_left", "_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l_tagged.unionByName(r_tagged).select(
        "_l",
        "_is_left",
        "_ts",
        F.last("_r_us", ignorenulls=True).over(w).alias("_m_us"),
        *[
            F.last(a, ignorenulls=True).over(w).alias(a)
            for a in carried
        ],
    ).filter(F.col("_is_left") == 1)

    if tolerance_us is not None:
        stale = (F.unix_micros(F.col("_ts")) - F.col("_m_us")) > F.lit(tolerance_us)
        matched = matched.select(
            "_l",
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(a)).alias(a)
                for a in carried
            ],
        )
    return matched.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(a).alias(c) for c, a in zip(right_cols, carried)],
    )


def range_join(
    probe: DataFrame,
    intervals: DataFrame,
    on: list[str],
    probe_ts: str,
    start_col: str,
    end_col: str,
    bucket_s: int,
    how: str = "inner",
) -> DataFrame:
    """Equi-join-shaped interval join: probe rows against half-open
    intervals ``[start, end)`` sharing the ``on`` keys.

    Each interval is exploded to the ``bucket_s``-second buckets it
    overlaps (pick ``bucket_s`` ≈ the typical interval length so the
    explosion factor stays O(1)); each probe row lands in exactly one
    bucket, so no post-join dedup is needed.  The result carries all
    columns of both inputs.
    """
    if bucket_s <= 0:
        raise ValueError(f"bucket_s must be positive, got {bucket_s}")
    b = F.lit(int(bucket_s))
    lo = F.floor(F.unix_seconds(F.col(start_col)) / b)
    # half-open: an interval ending exactly on a bucket edge excludes it
    hi = F.floor(
        (F.unix_seconds(F.col(end_col)) - F.lit(1)) / b
    )
    exploded = intervals.withColumn("_bucket", F.explode(F.sequence(lo, hi)))
    probed = probe.withColumn(
        "_bucket", F.floor(F.unix_seconds(F.col(probe_ts)) / b)
    )
    joined = probed.join(exploded, on=[*on, "_bucket"], how=how).filter(
        (F.col(probe_ts) >= F.col(start_col)) & (F.col(probe_ts) < F.col(end_col))
    )
    return joined.drop("_bucket")
