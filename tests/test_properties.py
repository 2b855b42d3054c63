"""Property-based tests (hypothesis) for the correctness-critical kernels.

These pin the *invariants* the oracle comparisons rely on:
- the fixed-point sum is order-independent and engine-stable;
- the quantized numpy cosine equals the Spark-expression cosine;
- salted joins are invariant over salt_n.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_tpch_spark.functions.exact import SCALE


@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_quantized_sum_order_independent(xs):
    q = 10**SCALE
    fwd = sum(math.floor(x * q) for x in xs)
    rev = sum(math.floor(x * q) for x in reversed(xs))
    srt = sum(math.floor(x * q) for x in sorted(xs))
    assert fwd == rev == srt


@given(
    st.lists(st.floats(-10, 10, allow_nan=False, width=32), min_size=4, max_size=64),
    st.lists(st.floats(-10, 10, allow_nan=False, width=32), min_size=4, max_size=64),
)
@settings(max_examples=100, deadline=None)
def test_numpy_quantized_dot_matches_scalar(a, b):
    """The vectorized kernel's floor-quantize-sum must equal the scalar
    per-element definition used by the Spark expression and the oracle."""
    from datafusion_tpch_spark.operators.similarity import _Q

    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    av = np.asarray(a, dtype=np.float64)
    bv = np.asarray(b, dtype=np.float64)
    vec = int(np.floor(av * bv * _Q).astype(np.int64).sum())
    scalar = sum(int(math.floor(float(x) * float(y) * _Q)) for x, y in zip(a, b))
    assert vec == scalar


@given(st.integers(1, 16))
@settings(max_examples=8, deadline=None)
def test_salt_slicing_partition_of_space(salt_n):
    """Every row lands in exactly one salt bucket; buckets tile 0..salt_n."""
    hashes = np.arange(-1000, 1000, dtype=np.int64)
    buckets = np.mod(np.mod(hashes, salt_n) + salt_n, salt_n)  # pmod
    assert buckets.min() >= 0 and buckets.max() < salt_n
    assert len(np.unique(buckets)) == min(salt_n, len(hashes))


@given(st.integers(0, 10_000_000), st.integers(1, 7))
@settings(max_examples=200, deadline=None)
def test_gen_slice_exact_partition(n, num_parts):
    """tpch_gen._slice tiles [0, n) exactly: no gaps, no overlaps."""
    from datafusion_tpch_spark.sources.tpch_gen import _slice

    spans = [_slice(n, p, num_parts) for p in range(1, num_parts + 1)]
    assert spans[0][0] == 0 and spans[-1][1] == n
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 == lo2 and lo1 <= hi1


# --- EXIF encode/parse/scrub ------------------------------------------------

_exif_ascii_st = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0, max_size=24,
)
_dms_st = st.tuples(
    st.integers(0, 179), st.integers(0, 59),
    st.tuples(st.integers(0, 5999), st.integers(1, 1000)),
)


@settings(max_examples=150, deadline=None)
@given(
    make=st.one_of(st.none(), _exif_ascii_st),
    model=st.one_of(st.none(), _exif_ascii_st),
    orientation=st.one_of(st.none(), st.integers(1, 8)),
    taken_at=st.one_of(st.none(), _exif_ascii_st),
    gps=st.one_of(
        st.none(),
        st.tuples(st.sampled_from(["N", "S"]), _dms_st,
                  st.sampled_from(["E", "W"]), _dms_st),
    ),
)
def test_exif_roundtrip_property(make, model, orientation, taken_at, gps):
    """encode → insert → parse recovers every field exactly, for arbitrary
    ASCII strings, any orientation, and arbitrary D/M/S rationals; the
    scrub is idempotent and only ever removes the GPS block."""
    import numpy as np

    from datafusion_tpch_spark.operators.multimodal import (
        encode_exif_app1,
        encode_jpeg,
        insert_app1,
        parse_exif,
        strip_gps_exif,
    )

    base = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    blob = insert_app1(base, encode_exif_app1(
        make=make, model=model, orientation=orientation,
        taken_at=taken_at, gps=gps))
    m = parse_exif(blob)
    assert m is not None
    assert m["make"] == make and m["model"] == model
    assert m["orientation"] == orientation and m["taken_at"] == taken_at
    if gps is None:
        assert m["lat_dd"] is None and m["lon_dd"] is None
        assert strip_gps_exif(blob) == blob  # nothing to scrub
    else:
        lat_ref, (d, mi, (sn, sd)), lon_ref, _ = gps
        want = d + mi / 60.0 + (sn / sd) / 3600.0
        if lat_ref == "S":
            want = -want
        assert m["lat_dd"] == want
        scrubbed = strip_gps_exif(blob)
        m2 = parse_exif(scrubbed)
        assert m2["lat_dd"] is None and m2["lon_dd"] is None
        assert m2["make"] == make and m2["orientation"] == orientation
        assert m2["taken_at"] == taken_at
        assert len(scrubbed) < len(blob)
        assert strip_gps_exif(scrubbed) == scrubbed  # idempotent
