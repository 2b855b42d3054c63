"""SQL-invocable TPC-H generator UDTFs — full reference parity.

The reference's primary UX is SQL table functions:
``SELECT * FROM tpch_lineitem(1.0)`` (``/root/reference/src/lib.rs:348``)
and the bulk ``SELECT * FROM tpch(1.0)`` returning a listing table
(``src/lib.rs:433``, ``examples/tpchgen.rs:12``).  This module registers
the same surface as Spark Python UDTFs for **all 8 tables** under the
reference's exact names with full spec schemas, plus ``tpch(sf)``.

Values are **identical** to the distributed Column-expression generators
(:mod:`tpch_gen`) — both derive every cell from the same xxhash64 stream
(:mod:`..functions.xxh64` is the verified numpy replica), pinned by
``tests/test_sql_udtf.py``.

Scale notes:

- A bare ``tpch_<t>(sf)`` call evaluates in ONE task — exactly the
  reference's own behavior (it generates the whole table in a single
  in-memory batch on the planning thread, ``src/lib.rs:111-126``).
- The *distributed* SQL spelling uses the part/num_parts arguments with a
  LATERAL join, fanning one task per part::

      SELECT t.* FROM range(1, 33) AS r(part),
      LATERAL tpch_lineitem(1.0, CAST(r.part AS INT), 32) AS t

  which matches the lazy partitioned DataFrame path (``call_tpch``) in
  both values and parallelism.
- ``tpch(sf)`` yields the reference's 1-column listing.  The reference
  additionally *registers* the 8 tables as a plan-time side effect
  (``src/lib.rs:232-261``); Spark UDTFs evaluate in executor workers where
  no catalog exists, so the registering equivalent is the Python call
  ``register_tpch(spark, sf)`` — same listing result, same side effect.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

from .. import TPCH_TABLES
from .tpch_gen import _validate
from .tpch_np import ROW_GENERATORS, SCHEMAS


def _make_table_udtf(table: str):
    rows = ROW_GENERATORS[table]

    class _TpchTableUdtf:
        def eval(self, sf, part=1, num_parts=1):  # noqa: ANN001
            yield from rows(float(sf), int(part), int(num_parts))

    _TpchTableUdtf.__name__ = f"Tpch{table.capitalize()}Udtf"
    return udtf(_TpchTableUdtf, returnType=SCHEMAS[table])


def _flush_tables(path: str, sf: float) -> None:
    """``tpch(sf, path)``'s documented second argument: flush every table
    to ``<path>/<table>.parquet``.  The reference *documents* this
    (``src/lib.rs:277-279``) but its ``call()`` never reads ``args[1]``
    (``src/lib.rs:282-290``) — the path is silently ignored.  Implemented
    for real here via pyarrow."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    for table, rows_fn in ROW_GENERATORS.items():
        rows = rows_fn(sf)
        names = [f.split()[0] for f in SCHEMAS[table].split(", ")]
        cols = list(zip(*rows)) if rows else [[] for _ in names]
        pq.write_table(
            pa.table({n: list(c) for n, c in zip(names, cols)}),
            os.path.join(path, f"{table}.parquet"),
        )


def _make_bulk_udtf():
    class TpchUdtf:
        def eval(self, sf, path=None):  # noqa: ANN001
            _validate(float(sf), 1, 1)
            if path:
                _flush_tables(str(path), float(sf))
            for t in TPCH_TABLES:
                yield (t,)

    return udtf(TpchUdtf, returnType="table_name string")


def register_tpch_udtfs(spark: SparkSession) -> None:
    """Make ``tpch_<table>(sf [, part, num_parts])`` for all 8 tables and
    the bulk ``tpch(sf)`` listing invocable from ``spark.sql`` — parity
    with the reference's ``register_tpch_udtfs`` (``src/lib.rs:189-200``)
    and ``tpch`` provider (``src/lib.rs:203-310``)."""
    for table in ROW_GENERATORS:
        spark.udtf.register(f"tpch_{table}", _make_table_udtf(table))
    spark.udtf.register("tpch", _make_bulk_udtf())
