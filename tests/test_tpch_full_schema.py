"""Full-schema Tier-C parity: the 22 canonical TPC-H query texts over
generated spec-complete tables, Spark SQL vs DuckDB on identical parquet.

Pipeline under test: Tier-A generators (sources/tpch_gen.py) → parquet sink
(sources/parquet_io.py, the reference's COPY surface) → both engines read
the same files → every canonical query must agree engine-to-engine.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

from datafusion_tpch_spark import TPCH_TABLES
from datafusion_tpch_spark.queries import tpch_full
from datafusion_tpch_spark.sources.parquet_io import copy_to_parquet
from datafusion_tpch_spark.sources.tpch_gen import GENERATORS

SF = 0.01
EXPORT_DIR = "/tmp/tpch_full_sf001"


@pytest.fixture(scope="session")
def full_schema(spark):
    """Generate all 8 tables once, export through the parquet sink, and
    register them in both engines."""
    for name in TPCH_TABLES:
        path = os.path.join(EXPORT_DIR, name)
        if not os.path.exists(path):
            copy_to_parquet(GENERATORS[name](spark, SF), path)
        spark.read.parquet(path).createOrReplaceTempView(name)
    con = duckdb.connect()
    for name in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{EXPORT_DIR}/{name}/*.parquet')"
        )
    return spark, con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.date().isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return v


def _approx_eq(a, b) -> bool:
    a, b = _norm(a), _norm(b)
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is b
        # Spark keeps decimal/decimal division at scale 6 where DuckDB
        # promotes to double — tolerate the scale-6 rounding quantum
        return math.isclose(float(a), float(b), rel_tol=1e-6, abs_tol=1e-5)
    return a == b


@pytest.mark.parametrize("name", sorted(tpch_full.queries(SF)))
def test_canonical_query_matches_duckdb(full_schema, name):
    spark, con = full_schema
    sql = tpch_full.queries(SF)[name]
    got = [tuple(_norm(v) for v in row) for row in spark.sql(sql).collect()]
    want = [tuple(_norm(v) for v in row) for row in con.execute(sql).fetchall()]
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    # ORDER BY keys can tie; compare as canonically sorted multisets
    key = lambda r: tuple((str(type(v)), str(v)) for v in r)  # noqa: E731
    got_s, want_s = sorted(got, key=key), sorted(want, key=key)
    for g, w in zip(got_s, want_s):
        assert len(g) == len(w), f"{name}: column count {len(g)} vs {len(w)}"
        for i, (gv, wv) in enumerate(zip(g, w)):
            assert _approx_eq(gv, wv), f"{name} col{i}: {gv!r} != {wv!r}"


def test_nonempty_coverage(full_schema):
    """The substitution parameters must exercise real data: most canonical
    queries return rows on the generated distribution (empty==empty passes
    are too weak to count as parity evidence)."""
    spark, _ = full_schema
    nonempty = 0
    for name, sql in tpch_full.queries(SF).items():
        if spark.sql(sql).limit(1).count() > 0:
            nonempty += 1
    assert nonempty >= 16, f"only {nonempty}/22 canonical queries hit data"
