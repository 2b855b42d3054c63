"""datafusion_tpch_spark — a PySpark-native analytics engine with the
capabilities of the ``clflushopt/datafusion-tpch`` DataFusion extension.

The reference crate (``/root/reference/src/lib.rs``) registers TPC-H
table-generating UDTFs into a DataFusion ``SessionContext`` and serves the
TPC-H analytical workload through the embedded engine.  Here the "embedded
engine" is Spark SQL / Catalyst; this package provides:

- ``session``    — tuned ``SparkSession`` builder (AQE, shuffle sizing).
- ``catalog``    — fixture-parquet catalog registration (temp views).
- ``sources``    — TPC-H table generators (reference parity for
                   ``src/lib.rs:15-316``) and parquet source/sink helpers.
- ``queries``    — the TPC-H workload (22 queries) + LLM-data-pipeline
                   extension queries, each as DataFrame builders with
                   matching ANSI-SQL oracle strings.
- ``operators``  — dedup / similarity-search / multimodal operators.
- ``functions``  — cross-engine-stable hashing, text and vector helpers.
- ``streaming``  — Structured Streaming variants of the event analytics.
- ``plans``      — physical-plan inspection helpers (pushdown/broadcast
                   assertions used by tests).
"""

__version__ = "0.1.0"

TPCH_TABLES = (
    "nation",
    "customer",
    "orders",
    "lineitem",
    "part",
    "partsupp",
    "supplier",
    "region",
)

# Tables present in the driver fixtures (TESTDATA.md); a column-subset of the
# full TPC-H schema plus three extension tables.
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
