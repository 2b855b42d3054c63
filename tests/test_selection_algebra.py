"""Property tests for the distributed-selection algebra behind the
round-4 plan rewrites.  Each rewrite replaced a single-reducer form with
a sharded/aggregated form and claimed value-identity; these properties
pin that claim over arbitrary inputs (pure Python/numpy — no Spark).

- nearest-rank selection == cumulative-count threshold over the multiset
- two-level salted k-min == global k smallest distinct values
- sharded prefix sum + carry-in == global running sum (and its max)
- min(struct) election == sort-based rank-1 election
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

values = st.lists(st.integers(min_value=-10_000, max_value=10_000),
                  min_size=1, max_size=300)


@settings(max_examples=200, deadline=None)
@given(values, st.integers(min_value=1, max_value=100))
def test_nearest_rank_equals_cumulative_threshold(xs, pct):
    """Element at rank ceil(pct*n/100) of the sorted multiset equals the
    smallest value whose cumulative count reaches that rank."""
    n = len(xs)
    target = max(-(-pct * n // 100), 1)  # ceil, floored at 1
    want = sorted(xs)[target - 1]
    # cumulative count over distinct values
    cum = 0
    got = None
    for v in sorted(set(xs)):
        cum += xs.count(v)
        if cum >= target:
            got = v
            break
    assert got == want


@settings(max_examples=200, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**40), min_size=1,
               max_size=400),
       st.integers(min_value=1, max_value=64),
       st.integers(min_value=1, max_value=32))
def test_two_level_kmin_is_mergeable(hashes, k, nsalt):
    """Per-salt k-min partials, unioned and re-truncated, equal the global
    k smallest distinct values for ANY k and salt fan-out."""
    want = sorted(hashes)[:k]
    partials = []
    for s in range(nsalt):
        partials.extend(sorted(h for h in hashes if h % nsalt == s)[:k])
    assert sorted(partials)[:k] == want


@settings(max_examples=200, deadline=None)
@given(values, st.integers(min_value=1, max_value=8))
def test_sharded_prefix_sum_with_carry(xs, nshards):
    """Local prefix sums per contiguous shard plus the carry-in of all
    earlier shards reconstruct the global running sum exactly (and hence
    its max — the sweep-line peak)."""
    # contiguous range shards
    per = -(-len(xs) // nshards)
    shards = [xs[i * per:(i + 1) * per] for i in range(nshards)]
    got = []
    carry = 0
    for sh in shards:
        run = 0
        for v in sh:
            run += v
            got.append(carry + run)
        carry += run
    want = []
    run = 0
    for v in xs:
        run += v
        want.append(run)
    assert got == want


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=200))
def test_weighted_dsum_equals_rowwise_dsum(xs):
    """functions.exact.dsum_weighted's identity: quantize each DISTINCT
    value once and multiply by its multiplicity == quantize every row and
    sum (floor is deterministic on doubles; integer multiplication is
    exact) — the audit-over-value_counts rewrite relies on this."""
    import math

    q = lambda v: math.floor(v * 10**8)  # noqa: E731
    rowwise = sum(q(v) for v in xs)
    weighted = sum(q(v) * c for v, c in
                   {v: xs.count(v) for v in set(xs)}.items())
    assert rowwise == weighted


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 1000)),
                min_size=1, max_size=200))
def test_min_struct_equals_rank_one(pairs):
    """min over (key1, key2) tuples == the first row of the (key1 asc,
    key2 asc) sort — the argmin election used for linkage best-match and
    label-propagation argmax (with negated counts)."""
    assert min(pairs) == sorted(pairs)[0]
