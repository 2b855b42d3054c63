"""Non-emptiness guard for the 22 spec-typed canonical driver gates
(queries/tpch_spec.py).

Oracle parity for these gates is proven by the driver window and
tests/test_queries_vs_oracle.py; what parity alone can't prove is that a
gate still HITS data — a fixture or parameter drift that empties a
result would keep hashing equal (empty == empty) while gutting the
evidence.  Four texts carry documented parameter knobs precisely to stay
non-empty (q11/q18/q20/q22); this test pins that property for all 22."""

from __future__ import annotations

import pytest

from datafusion_tpch_spark.queries import tpch_spec

SPEC_NAMES = sorted(s.name for s in tpch_spec.SPECS)


def test_all_22_canonical_texts_are_gates():
    assert SPEC_NAMES == sorted(f"q{i}_spec" for i in range(1, 23))


@pytest.mark.parametrize("name", SPEC_NAMES)
def test_spec_gate_returns_rows(spark, name):
    spec = {s.name: s for s in tpch_spec.SPECS}[name]
    assert spec.build(spark, "unused").limit(1).count() == 1
