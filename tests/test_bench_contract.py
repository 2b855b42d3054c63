"""Driver bench contract: bench.py must emit ONE JSON line that fits the
driver's recorded output tail (~4096 chars of combined stdout+stderr).
The line length grows with the registry, so this test fails BEFORE a new
query silently pushes the closing brace out of the driver's window."""

from __future__ import annotations

import json

from datafusion_tpch_spark.queries import all_queries

# bench.py degrades per-query precision 3 -> 2 -> 1 digits, and in the
# 1-digit fallback any value >= 10s collapses to whole seconds clamped
# at 999 — so the widest possible per-query value is exactly 3 chars
# ("9.9", "99", or "999"; nothing can encode wider).  The model stubs
# every value at that 3-char maximum, mirroring bench.py's
# final-fallback encoder exactly.
_DRIVER_TAIL = 4096
_HEADROOM = 200  # trailing newline + stray shutdown chatter allowance


def _final_fallback_length(value_stub: float) -> int:
    v = (
        min(round(value_stub), 999)
        if value_stub >= 10
        else round(value_stub, 1)
    )
    line = json.dumps(
        {
            "metric": "total query wall time",
            "value": 9999.9999,
            "unit": "sec",
            "queries": {k: v for k in all_queries()},
            "sf": 0.1,
        },
        separators=(",", ":"),
    )
    return len(line)


def test_final_fallback_fits_driver_tail():
    # hard limit: even a pathological run where every query hits the
    # 999-second clamp ("999" = the 3-char encoder maximum) must fit
    assert _final_fallback_length(99999) <= _DRIVER_TAIL - _HEADROOM


def test_registry_growth_margin():
    """Early warning, STRICTLY tighter than the hard-limit test. It
    FIRED at 164 queries and the decision was taken: 164 is the
    registry ceiling under this encoding — the remaining margin (~25
    chars, ≈3 queries) is reserved for emergencies only. Growing the
    registry further requires an encoding change FIRST (integer-ms
    values or a side-channel file negotiated with the driver), not a
    bigger margin here."""
    assert _final_fallback_length(9.9) <= _DRIVER_TAIL - _HEADROOM - 25, (
        "bench JSON line is at the driver's 4096-char tail window; "
        "change the encoding BEFORE registering more queries"
    )
