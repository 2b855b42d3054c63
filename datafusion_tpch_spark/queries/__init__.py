"""Query registry.

Every implemented operator/query is a :class:`QuerySpec`: a DataFrame
builder ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an
ANSI-SQL oracle string the driver runs through DuckDB.  Column names are
aliased identically on both sides — the driver sorts columns by name before
hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""


def all_queries() -> dict[str, QuerySpec]:
    """Merged registry across the TPC-H core and the extension operators."""
    from . import extensions, stream, tpch

    out: dict[str, QuerySpec] = {}
    for mod in (tpch, extensions, stream):
        for spec in mod.SPECS:
            assert spec.name not in out, f"duplicate query name {spec.name}"
            out[spec.name] = spec
    return out
