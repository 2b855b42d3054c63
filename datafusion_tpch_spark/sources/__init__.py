from . import parquet_io, tpch_gen  # noqa: F401
