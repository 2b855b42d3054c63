"""connected_components: labeling semantics, convergence, conf hygiene."""

from __future__ import annotations

from datafusion_tpch_spark.operators.graph import connected_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, **kw)
    return {r.node: r.component for r in out.collect()}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: every node labels to 1
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_components(spark):
    got = _cc(spark, [(10, 11), (11, 12), (20, 21), (30, 31)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}


def test_direction_irrelevant(spark):
    # edges listed "backwards" still produce min-id labeling
    got = _cc(spark, [(5, 4), (4, 3), (3, 2), (2, 1)])
    assert set(got.values()) == {1}


def test_narrow_scope_restores_conf(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    _cc(spark, [(1, 2)], num_partitions=2)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_cycle(spark):
    got = _cc(spark, [(1, 2), (2, 3), (3, 1)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_deep_chain_converges_within_log_rounds(spark):
    # 64-node chain (diameter 63): pointer jumping must converge well
    # inside the max_iter guard — this is the O(log diameter) claim the
    # shallow fixtures never exercise.  max_iter=10 > log2(63)+slack;
    # plain one-hop propagation would need >60 rounds and hit the guard.
    n = 64
    edges = [(i, i + 1) for i in range(1, n)]
    got = _cc(spark, edges, max_iter=10, num_partitions=4)
    assert got == {i: 1 for i in range(1, n + 1)}


def test_interlocked_rings_and_isolated_pair(spark):
    # two rings sharing one node collapse to one component; a separate
    # edge stays its own component
    ring1 = [(i, i + 1) for i in range(1, 6)] + [(6, 1)]
    ring2 = [(i, i + 1) for i in range(6, 11)] + [(11, 6)]
    got = _cc(spark, ring1 + ring2 + [(100, 101)])
    assert set(got.values()) == {1, 100}
    assert all(got[i] == 1 for i in range(1, 12))


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------

from datafusion_tpch_spark.operators.graph import pagerank


def _pr(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    out = pagerank(df, weight="w", **kw)
    return {r.node: r.pr for r in out.collect()}


def test_pagerank_sink_attracts_mass(spark):
    # a -> b, c -> b: b must outrank its sources
    got = _pr(spark, [("a", "b", 1), ("c", "b", 1)])
    assert got["b"] > got["a"] == got["c"]


def test_pagerank_symmetric_cycle_uniform(spark):
    # 2-cycle with equal weights: ranks identical and mass conserved
    got = _pr(spark, [("a", "b", 1), ("b", "a", 1)])
    assert got["a"] == got["b"]
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pagerank_weight_beats_unweighted(spark):
    # a splits 9:1 between b and c -> b gets ~9x c's incoming share
    got = _pr(spark, [("a", "b", 9), ("a", "c", 1)], iterations=1)
    assert got["b"] > got["c"]


def test_pagerank_deterministic_across_runs(spark):
    edges = [("a", "b", 3), ("b", "c", 2), ("c", "a", 5), ("a", "c", 1)]
    assert _pr(spark, edges) == _pr(spark, edges)
