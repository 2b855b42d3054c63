"""Driver bench contract: bench.py must emit ONE JSON line that fits the
driver's recorded output tail (~4096 chars of combined stdout+stderr).
The line length grows with the registry, so this test fails BEFORE a new
query silently pushes the closing brace out of the driver's window."""

from __future__ import annotations

import json

from datafusion_tpch_spark.queries import all_queries

# bench.py degrades per-query precision 3 -> 2 -> 1 digits; the worst
# surviving line is the 1-digit encoding with every value >= 10 seconds
# (5 chars like "10.3") — far beyond any observed timing, so the bound
# here is conservative.
_DRIVER_TAIL = 4096
_HEADROOM = 200  # trailing newline + stray shutdown chatter allowance


def _encoded_length(ndigits: int, value_stub: float) -> int:
    line = json.dumps(
        {
            "metric": "total query wall time, all registered queries",
            "value": 9999.9999,
            "unit": "sec",
            "queries": {k: round(value_stub, ndigits) for k in all_queries()},
            "sf": 0.1,
        },
        separators=(",", ":"),
    )
    return len(line)


def test_one_digit_line_fits_driver_tail():
    # realistic worst case: every query at 9.9s (most run in <2s)
    assert _encoded_length(1, 9.9) <= _DRIVER_TAIL - _HEADROOM


def test_registry_growth_margin():
    """Fail loudly when the registry grows enough that even the 1-digit
    fallback approaches the window — the signal to shorten the metric
    label or split the bench line, not to lose per-query records."""
    assert _encoded_length(1, 9.9) <= 3900, (
        "bench JSON line is nearing the driver's 4096-char tail window; "
        "shrink the encoding before adding more queries"
    )
