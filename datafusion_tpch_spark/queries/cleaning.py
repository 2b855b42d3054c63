"""Data-cleaning operators: the repair steps between raw ingested data
and analytics-grade tables — missing-value imputation, outlier
winsorization, and semi-structured schema-drift auditing.

Same design rules as the rest of the extension surface: JVM-side
built-ins only, window/aggregate plans with one hash shuffle each, every
gate mirrored by a DuckDB oracle with identical column names and
integer-or-quantized outputs so the driver's value-hash comparison is
exact.  Null injection for the imputation gate is deterministic (a key
modulus), so both engines clean the identical dirty table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum_sql, dsum_weighted
from ..operators.selection import rank_thresholds_from_counts, value_counts
from . import QuerySpec
from .extensions import _t

# ===========================================================================
# Median imputation of synthetically-missing values
# ===========================================================================

_IMP_MOD = 13  # every 13th part key loses its price (deterministic dirt)


def part_impute_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value repair: prices nulled on a deterministic key modulus
    are imputed with the per-brand exact lower median of the surviving
    values — the classic grouped-median fill.  The median is nearest-rank
    (position ceil(n/2) — integer arithmetic, no interpolation), and the
    rank threshold depends only on the price multiset, so it comes from
    a cumulative count over the distinct-(brand, price) table — the same
    domain-bounded form as lineitem_winsorize: the per-brand reducer
    carries |price domain| rows, never the data.  Output audits the
    repair: rows, nulls imputed, the median used, and the
    quantized-exact post-repair sum per brand."""
    (p,) = _t(spark, sf_dir, "part")
    dirty = p.select(
        "p_partkey",
        "p_brand",
        F.when(F.col("p_partkey") % _IMP_MOD == 0, F.lit(None).cast("double"))
        .otherwise(F.col("p_retailprice"))
        .alias("price"),
    )
    # ONE aggregation to distinct (brand, price) — null prices kept as
    # their own group (the audit needs them) — consumed by BOTH the
    # median machinery and the weighted audit below, so the part scan and
    # its exchange are planned once and reused (guide §2.4; the row-level
    # join-back this replaces rescanned part a second time)
    counts = value_counts(
        dirty.select("p_brand", "price"),
        group_by=["p_brand"],
        value_col="price",
    )
    med = rank_thresholds_from_counts(
        counts,
        group_by=["p_brand"],
        value_col="price",
        targets={"brand_median": lambda cnt: F.floor((cnt + 1) / 2)},
    )
    fixed = counts.join(F.broadcast(med), "p_brand")
    return (
        fixed.groupBy("p_brand")
        .agg(
            F.sum("_c").alias("n_rows"),
            F.sum(F.when(F.col("price").isNull(), F.col("_c")).otherwise(0))
            .cast("long")
            .alias("n_imputed"),
            F.max("brand_median").alias("brand_median"),
            dsum_weighted(
                F.coalesce("price", "brand_median"), F.col("_c")
            ).alias("sum_fixed"),
        )
        .orderBy("p_brand")
    )


PART_IMPUTE_MEDIAN_SQL = f"""
WITH dirty AS (
  SELECT p_partkey, p_brand,
         CASE WHEN p_partkey % {_IMP_MOD} = 0 THEN NULL
              ELSE p_retailprice END AS price
  FROM part),
ranked AS (
  SELECT p_brand, price,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY price, p_partkey) AS rn,
         COUNT(*) OVER (PARTITION BY p_brand) AS cnt
  FROM dirty WHERE price IS NOT NULL),
med AS (
  SELECT p_brand, price AS brand_median
  FROM ranked WHERE rn = CAST(floor((cnt + 1) / 2) AS BIGINT)),
fixed AS (
  SELECT d.p_brand, d.price,
         COALESCE(d.price, m.brand_median) AS price_fixed,
         m.brand_median
  FROM dirty d JOIN med m ON m.p_brand = d.p_brand)
SELECT p_brand, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN price IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_imputed,
       MAX(brand_median) AS brand_median,
       {dsum_sql('price_fixed')} AS sum_fixed
FROM fixed
GROUP BY p_brand
ORDER BY p_brand
"""


# ===========================================================================
# Winsorization (percentile clipping) of outliers
# ===========================================================================

def lineitem_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier treatment by winsorizing: per returnflag, prices are
    clipped to the exact nearest-rank [p01, p99] band with integer rank
    targets (ceil(n/100), ceil(99n/100)) — no interpolation, no libm.
    The nearest-rank threshold depends only on the price MULTISET, so it
    comes from a cumulative count over the distinct-(flag, price) table:
    one hash aggregation, one per-flag window whose reducer carries
    |price domain| rows — a bounded domain for a DECIMAL(15,2) money
    column — never the data itself (the row-level rank window this
    replaces would drag every row of a 100 TB table through 3 reducers;
    if the value domain ever outgrew a reducer, part_skyline's
    range-sharded prefix scan is the next rung).  Thresholds broadcast
    back for the clip pass; output audits the treatment."""
    (li,) = _t(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
    )
    # ONE aggregation of lineitem to distinct (flag, price) counts,
    # consumed by BOTH the threshold machinery and the clip audit — the
    # clip re-aggregates the counts weighted by _c (every row with the
    # same price clips identically, and dsum's quantization is per
    # distinct value, so the weighted form is bit-identical), which
    # removes the second lineitem scan + row-level broadcast join the
    # previous shape paid (guide §2.2/§2.4: one exchange, two grains)
    counts = value_counts(base, group_by=["flag"], value_col="price")
    th = rank_thresholds_from_counts(
        counts,
        group_by=["flag"],
        value_col="price",
        targets={
            "p01": lambda cnt: F.floor((cnt + 99) / 100),
            "p99": lambda cnt: F.floor((F.lit(99) * cnt + 99) / 100),
        },
    )
    clipped = counts.join(F.broadcast(th), "flag").select(
        "flag",
        "price",
        "p01",
        "p99",
        "_c",
        F.greatest(F.least(F.col("price"), F.col("p99")), F.col("p01")).alias(
            "price_w"
        ),
    )
    return (
        clipped.groupBy("flag")
        .agg(
            F.sum("_c").alias("n_rows"),
            F.sum(
                F.when(F.col("price") < F.col("p01"), F.col("_c")).otherwise(0)
            )
            .cast("long")
            .alias("n_capped_low"),
            F.sum(
                F.when(F.col("price") > F.col("p99"), F.col("_c")).otherwise(0)
            )
            .cast("long")
            .alias("n_capped_high"),
            F.max("p01").alias("p01"),
            F.max("p99").alias("p99"),
            dsum_weighted(F.col("price_w"), F.col("_c")).alias(
                "sum_winsorized"
            ),
        )
        .orderBy("flag")
    )


LINEITEM_WINSORIZE_SQL = f"""
WITH base AS (
  SELECT l_returnflag AS flag, l_extendedprice AS price,
         l_orderkey, l_linenumber
  FROM lineitem),
ranked AS (
  SELECT flag, price,
         ROW_NUMBER() OVER (PARTITION BY flag
                            ORDER BY price, l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY flag) AS cnt
  FROM base),
th AS (
  SELECT flag, MIN(price) AS p01, MAX(price) AS p99
  FROM ranked
  WHERE rn = CAST(floor((cnt + 99) / 100) AS BIGINT)
     OR rn = CAST(floor((99 * cnt + 99) / 100) AS BIGINT)
  GROUP BY flag),
clipped AS (
  SELECT b.flag, b.price, th.p01, th.p99,
         GREATEST(LEAST(b.price, th.p99), th.p01) AS price_w
  FROM base b JOIN th ON th.flag = b.flag)
SELECT flag, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN price < p01 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_capped_low,
       CAST(SUM(CASE WHEN price > p99 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_capped_high,
       MAX(p01) AS p01, MAX(p99) AS p99,
       {dsum_sql('price_w')} AS sum_winsorized
FROM clipped
GROUP BY flag
ORDER BY flag
"""


# ===========================================================================
# Semi-structured schema-drift audit (JSON key census)
# ===========================================================================

def events_props_key_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift monitoring for semi-structured payloads: a census of
    which JSON keys appear in ``props`` per event type, with coverage as
    a floor-quantized per-million share — the audit that catches a
    producer silently adding/dropping fields.  Keys come from
    ``from_json`` to a map + ``map_keys`` (JVM-side; no Python); one
    explode + one aggregation + a broadcast of per-type totals.  At
    100 TB the explode fan-out is bounded by keys-per-payload, and the
    census table is vocabulary-sized."""
    (ev,) = _t(spark, sf_dir, "events")
    keys = ev.select(
        "event_type",
        F.explode(
            F.map_keys(F.from_json(F.col("props"), "map<string,string>"))
        ).alias("key"),
    )
    totals = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_total"))
    return (
        keys.groupBy("event_type", "key")
        .agg(F.count(F.lit(1)).alias("n_with_key"))
        .join(F.broadcast(totals), "event_type")
        .withColumn(
            "coverage_ppm",
            F.floor(
                F.col("n_with_key").cast("double")
                / F.col("n_total").cast("double")
                * F.lit(1e6)
            ).cast("long"),
        )
        .orderBy("event_type", "key")
    )


EVENTS_PROPS_KEY_CENSUS_SQL = """
WITH keys AS (
  SELECT event_type, unnest(json_keys(props)) AS key FROM events),
totals AS (
  SELECT event_type, COUNT(*) AS n_total FROM events GROUP BY event_type)
SELECT k.event_type, k.key, COUNT(*) AS n_with_key, t.n_total,
       CAST(floor(CAST(COUNT(*) AS DOUBLE) / CAST(t.n_total AS DOUBLE)
                  * 1000000.0) AS BIGINT) AS coverage_ppm
FROM keys k JOIN totals t ON t.event_type = k.event_type
GROUP BY k.event_type, k.key, t.n_total
ORDER BY k.event_type, k.key
"""


SPECS = [
    QuerySpec(
        "part_impute_median", part_impute_median, PART_IMPUTE_MEDIAN_SQL,
        "grouped exact-median imputation of deterministically-nulled prices",
    ),
    QuerySpec(
        "lineitem_winsorize", lineitem_winsorize, LINEITEM_WINSORIZE_SQL,
        "winsorize to exact nearest-rank [p01,p99] with repair audit",
    ),
    QuerySpec(
        "events_props_key_census", events_props_key_census,
        EVENTS_PROPS_KEY_CENSUS_SQL,
        "JSON key census per event type: schema-drift coverage audit",
    ),
]
