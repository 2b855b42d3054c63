"""Iterative graph operators: connected components via distributed
min-label propagation.

The canonical use in a training-data pipeline is near-dup *cluster*
formation: pairwise near-dup edges (MinHash/SRP/n-gram verify output) are
only half the dedup story — survivors are elected per connected component
(keep one doc per cluster), which needs transitive closure, an iterative
algorithm no single SQL join expresses.

Execution model: the driver runs the convergence loop (rounds ≈ component
diameter, a handful for the shallow clusters near-dup graphs produce), but
every iteration is a pair of distributed hash joins/aggregations; nothing
data-sized ever lands on the driver.  Each iteration reuses the same (node) partitioning, and the
label frontier is localCheckpoint'ed to cut the growing lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Loop-shuffle sizing: one loop task holds on the order of this many edge
# rows.  Derived from the MEASURED edge count — the edge list is
# localCheckpoint-materialized first, so the count is one small job over
# cached blocks — and clamped to the session's parallelism; never a
# constant.  A vocabulary-sized transition graph runs its rounds in one
# task instead of scheduling session-width empty tasks per stage, while a
# 100 TB edge list keeps full cluster width.  (The checkpointed RDD's own
# partition count is NOT a usable proxy: a union/narrow tail is never
# AQE-coalesced, so it reflects session width, not data size.)
_LOOP_ROWS_PER_TASK = 65_536


def _loop_width(checkpointed: DataFrame) -> int:
    cap = checkpointed.sparkSession.sparkContext.defaultParallelism
    n_rows = checkpointed.count()
    return max(1, min(cap, -(-n_rows // _LOOP_ROWS_PER_TASK)))


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    num_partitions: int | None = None,
) -> DataFrame:
    """Connected components over an undirected edge list.

    Returns ``(node, component)`` where ``component`` is the minimum node
    id reachable from ``node`` — a deterministic canonical labeling.

    Min-label propagation with pointer jumping: each round every node
    takes the min of its own label and its neighbors' labels, then jumps
    to its label's label (labels are always real node ids, so the parent
    lookup is a self-join).  The jump makes label trees collapse in
    O(log diameter) rounds instead of O(diameter).  Convergence is
    detected through a monotone invariant — labels only ever decrease, so
    the label sum is strictly decreasing until fixpoint; one scalar
    aggregate per round, no extra join.  ``max_iter`` is a runaway guard.
    """
    spark = edges.sparkSession
    # materialize the (possibly expensive) upstream edge pipeline ONCE, at
    # the session's full width — every round joins against it, and without
    # this each round would recompute the whole edge derivation.  Only the
    # label loop runs under the narrowed shuffle width: num_partitions
    # sizes the loop's shuffles to the graph (a small graph on a wide
    # session wastes each round on empty-task scheduling); when None it is
    # DERIVED from the measured doubled-edge count — never a constant.
    # The conf is restored after the loop; the returned frame is
    # localCheckpoint-materialized inside the scope.
    both = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).localCheckpoint(eager=False)
    if num_partitions is None:
        # the count in _loop_width materializes the lazy checkpoint
        num_partitions = _loop_width(both)
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(num_partitions))
    # the checkpoint above ran at session width; coalesce (narrow, no
    # shuffle, no recompute) so every round's scan schedules
    # num_partitions tasks instead of session-width mostly-empty ones
    both = both.coalesce(num_partitions)
    try:
        return _cc_loop(both, max_iter)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)


def _cc_loop(both: DataFrame, max_iter: int) -> DataFrame:
    # Fused first round: with identity labels the neighbor minimum is just
    # min(neighbor id) per node, so round 1 is a plain aggregate over the
    # edge list — one shuffle, no join — instead of a full join round.
    # Lazy checkpoint + immediate scalar action: the sum collect BOTH
    # materializes the checkpoint (so next round's two joins scan saved
    # blocks, same as eager) AND initializes the convergence baseline —
    # one scheduled job where eager-checkpoint-then-sum took two, and the
    # baseline lets a star-shaped graph (every near-dup cluster whose
    # members all touch the min doc) terminate after ONE loop round.
    labels = (
        both.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("nmin"))
        .select(
            "node", F.least(F.col("node"), F.col("nmin")).alias("component")
        )
        .localCheckpoint(eager=False)
    )
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]
    for _ in range(max_iter):
        # neighbor minimum: smallest label among each node's neighbors
        neigh = (
            both.join(labels, both.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("neigh_min"))
            .withColumnRenamed("a", "node")
        )
        updated = labels.join(neigh, "node", "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce("neigh_min", "component")
            ).alias("component"),
        )
        # pointer jump: follow my label to ITS label (component ids are
        # node ids, so the parent lookup is a self-join on the label)
        parents = updated.select(
            F.col("node").alias("component"), F.col("component").alias("_parent")
        )
        labels = (
            updated.join(parents, "component", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("_parent", "component")
                ).alias("component"),
            )
            # lazy checkpoint, materialized by the convergence collect
            # below: one job per round instead of eager-checkpoint + sum
            # (persist() instead measured ~80% slower here — cache-write
            # overhead plus a cached-plan AQE boundary)
            .localCheckpoint(eager=False)
        )
        s = labels.agg(F.sum("component")).collect()[0][0]
        if s == prev_sum:
            break
        prev_sum = s
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank with a fixed iteration count.

    Returns ``(node, pr)``.  Each iteration is one hash join (rank ->
    out-edges, keyed on src) and one hash aggregation (contributions,
    keyed on dst) — the textbook distributed formulation; nothing
    data-sized touches the driver and the loop length is a plan-time
    constant, so the whole computation is a single Catalyst plan.
    Dangling mass is not redistributed (ranks are comparative, not a
    probability simplex — same convention on both sides of the gate).

    Determinism: the per-node contribution sum runs through the
    floor-quantized decimal reducer (functions.exact.dsum), so the result
    is order-independent and bit-identical to the unrolled SQL oracle.

    Scale/plan shape: the loop-invariant tables are checkpointed
    PRE-PARTITIONED on their loop join keys at a width derived from the
    measured edge count — ``e`` hashed on ``e_src``, ``nodes`` on
    ``node`` — so every unrolled round plans exactly ONE exchange (the
    contribution re-key onto dst); the rank→edges join and the
    rank-update join reuse the checkpointed partitionings (guide §2.4;
    previously each round re-shuffled the edge list AND the node table).
    Iterations is O(1) in data size — rank converges in a fixed handful
    of rounds regardless of corpus scale.
    """
    from ..functions.exact import dsum

    w = (
        F.col(weight).cast("double")
        if weight
        else F.lit(1.0)
    )
    e0 = edges.select(
        F.col(src).alias("e_src"), F.col(dst).alias("e_dst"), w.alias("e_w")
    ).localCheckpoint(eager=False)
    # the count in _loop_width materializes the lazy checkpoint — ONE job
    # both saves the edge derivation and sizes the loop
    p = _loop_width(e0)
    outw = e0.groupBy("e_src").agg(F.sum("e_w").alias("e_ow"))
    # checkpoint AFTER the out-weight join, hash-partitioned on the loop
    # join key: all `iterations` unrolled rounds (and the node
    # derivation) scan the saved blocks with their partitioning intact
    e = (
        e0.join(outw, "e_src")
        .repartition(p, "e_src")
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("e_src").alias("node"))
        .union(e.select("e_dst"))
        .distinct()
        .repartition(p, "node")
        .localCheckpoint()
    )
    n = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    pr = nodes.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("n_nodes").cast("double")).alias("pr")
    )
    for _ in range(iterations):
        contrib = (
            e.join(pr, e.e_src == pr.node)
            .select(
                F.col("e_dst").alias("node"),
                (F.col("pr") * F.col("e_w") / F.col("e_ow")).alias("c"),
            )
            # the round's one exchange: re-key contributions onto the
            # destination at loop width; both grouped aggregates and the
            # rank-update join below ride this partitioning
            .repartition(p, "node")
            .groupBy("node")
            .agg(dsum(F.col("c")).alias("csum"))
        )
        pr = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("n_nodes").cast("double")
                    + F.lit(damping) * F.coalesce("csum", F.lit(0.0))
                ).alias("pr"),
            )
        )
    return pr


def label_propagation(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    iterations: int = 2,
) -> DataFrame:
    """Synchronous label propagation for community detection over an
    undirected edge list: every node starts as its own label, and each
    round every node adopts the most frequent label among its neighbors
    (ties break to the smallest label — fully deterministic, unlike the
    usual randomized async variant).  Returns ``(node, label)``.

    Each round is one hash join (labels onto the doubled edge list) and
    one two-level aggregation (label counts → per-node argmax via
    a min(struct) argmax election) — node-keyed shuffles only, nothing
    data-sized on the driver, fixed round count → one Catalyst plan.

    Plan shape: the doubled edge list is checkpointed PRE-PARTITIONED on
    ``v`` (the loop join key) at a width derived from the measured edge
    count, and each round's label counts ride ONE explicit re-key onto
    ``u`` — hash-partitioning on ``node`` satisfies the finer
    (node, label) grouping too, so both aggregation levels AND the next
    round's join reuse it (guide §2.4; previously each round planned a
    join exchange plus two aggregate exchanges at session width).
    """
    und = (
        edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .union(edges.select(F.col(b).alias("u"), F.col(a).alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # the count in _loop_width materializes the lazy checkpoint — one job
    p = _loop_width(und)
    und = und.repartition(p, "v").localCheckpoint()
    # seed labels pre-keyed on node at loop width (the distinct rides the
    # same exchange), so even the FIRST round's join is exchange-free
    labels = (
        und.select(F.col("u").alias("node"))
        .repartition(p, "node")
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(iterations):
        neigh = und.join(
            labels.withColumnRenamed("node", "v"), "v"
        ).select(F.col("u").alias("node"), "label")
        # the round's one exchange: re-key onto the adopting node at loop
        # width; (node) hash-partitioning satisfies the (node, label)
        # grouping below, the per-node argmax, and — after the rename —
        # the next round's join on v
        counts = neigh.repartition(p, "node").groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("n")
        )
        # argmax(count) with ties to the smallest label, as a hash
        # aggregate: min of the struct (-n, label) is exactly that
        # ordering, with map-side combine instead of a per-node sort
        labels = (
            counts.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("n")).alias("nn"), F.col("label"))
                ).alias("m")
            )
            .select("node", F.col("m.label").alias("label"))
        )
    return labels
