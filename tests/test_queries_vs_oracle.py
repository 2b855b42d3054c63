"""Every registered query must hash-match its DuckDB oracle at sf0.001 —
the local replica of the driver's t2 correctness gate (see SURVEY.md §5:
this is the golden-output tier the reference lacks; its own tests only
assert row/column counts, /root/reference/src/lib.rs:335-344)."""

from __future__ import annotations

import pandas as pd
import pytest

from datafusion_tpch_spark.queries import all_queries

from conftest import SF_DIR

SPECS = sorted(all_queries().items())


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name,spec", SPECS, ids=[n for n, _ in SPECS])
def test_query_matches_oracle(name, spec, spark, oracle):
    got = spec.build(spark, SF_DIR).toPandas()
    if spec.oracle is None:
        assert got is not None
        return
    want = oracle.execute(spec.oracle).fetchdf()
    s, o = canon(got), canon(want)
    assert list(s.columns) == list(o.columns)
    assert [str(t) for t in s.dtypes] == [str(t) for t in o.dtypes], (
        f"dtype drift breaks the driver value-hash: {list(zip(s.dtypes, o.dtypes))}"
    )
    pd.testing.assert_frame_equal(s, o, check_exact=True)
