"""Semantics and plan-shape tests for the round-3 advanced operators
(queries/advanced.py + the stateful-streaming gate)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from datafusion_tpch_spark.catalog import load_table
from datafusion_tpch_spark.plans import exchange_count
from datafusion_tpch_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


def _build(spark, name):
    return all_queries()[name].build(spark, SF_DIR)


# ---------------------------------------------------------------- skyline

def test_skyline_equals_bruteforce(spark):
    got = {
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in _build(spark, "part_skyline").collect()
    }
    rows = (
        load_table(spark, SF_DIR, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    )
    pts = [(r["p_partkey"], r["p_retailprice"], r["p_size"]) for r in rows]
    expect = {
        (k, pr, sz)
        for (k, pr, sz) in pts
        if not any(
            qp <= pr and qs >= sz and (qp < pr or qs > sz)
            for (_, qp, qs) in pts
        )
    }
    assert got == expect and got


def test_skyline_mutual_nondominance(spark):
    rows = _build(spark, "part_skyline").collect()
    # along the frontier sorted by ascending price, size must strictly
    # increase (a cheaper point with >= size would dominate its successor)
    srt = sorted((r["p_retailprice"], r["p_size"]) for r in rows)
    for (p1, s1), (p2, s2) in zip(srt, srt[1:]):
        assert p2 > p1 or s2 == s1
        if p2 > p1:
            assert s2 > s1


# ------------------------------------------------------------- triangles

def test_triangles_are_real_and_ordered(spark):
    tri = _build(spark, "events_triangle_count").collect()
    ev = load_table(spark, SF_DIR, "events")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
    edges = {
        (r["a"], r["b"])
        for r in seq.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .collect()
    }
    assert tri, "fixture transition graph should contain triangles"
    for r in tri:
        a, b, c = r["a"], r["b"], r["c"]
        assert a < b < c  # each triangle enumerated exactly once
        assert {(a, b), (b, c), (a, c)} <= edges


# ------------------------------------------------------------- changelog

def test_changelog_counts_match_construction(spark):
    rows = {r["change_type"]: r for r in _build(spark, "orders_changelog").collect()}
    o = load_table(spark, SF_DIR, "orders")
    n_upd = o.filter(F.col("o_orderkey") % 101 == 0).count()
    n_del = o.filter(
        (F.col("o_orderkey") % 83 == 0) & (F.col("o_orderkey") % 101 != 0)
    ).count()
    assert rows["insert"]["n_changes"] == n_upd  # shifted-key inserts
    assert rows["delete"]["n_changes"] == n_del
    # key 0 is updated (+500) but 0 % anything == 0 keeps it in both sets
    assert rows["update"]["n_changes"] == n_upd
    up = rows["update"]
    assert abs((up["sum_new"] - up["sum_old"]) - 500.0 * n_upd) < 1e-3


# ---------------------------------------------------------- chunk dedup

def test_chunk_dedup_invariants(spark):
    rows = _build(spark, "docs_chunk_dedup").collect()
    docs = load_table(spark, SF_DIR, "documents")
    assert len(rows) == docs.count()
    by_id = sorted(rows, key=lambda r: r["doc_id"])
    assert by_id[0]["n_dup_chunks"] == 0  # first doc can't duplicate earlier
    for r in rows:
        assert 0 <= r["n_dup_chunks"] <= r["n_chunks"]
    # chunk totals reconstruct ceil(words/10) per doc
    expect = {
        r["doc_id"]: (r["n"] + 9) // 10
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    for r in rows:
        assert r["n_chunks"] == expect[r["doc_id"]]


# -------------------------------------------------------- record linkage

def test_linkage_recovers_all_dirty_records(spark):
    rows = _build(spark, "customer_record_linkage").collect()
    c = load_table(spark, SF_DIR, "customer")
    n_dirty = c.filter(F.col("c_custkey") % 3 == 0).count()
    assert sum(r["n_dirty"] for r in rows) == n_dirty
    # one dropped char -> distance 1 to the true record, which must win
    assert sum(r["n_recovered"] for r in rows) == n_dirty
    assert sum(r["sum_dist"] for r in rows) == n_dirty


# ------------------------------------------------------------ HLL sketch

def test_hll_estimate_tracks_exact(spark):
    """The consumer-side corrected estimator (linear counting while empty
    buckets remain, raw HLL otherwise — derivable entirely from the gate's
    output columns) must track the exact count."""
    import math

    rows = _build(spark, "events_hll_distinct").collect()
    assert rows
    for r in rows:
        assert 1 <= r["m_used"] <= 64
        m, v = 64, 64 - r["m_used"]
        est = m * math.log(m / v) if v > 0 else r["raw_est"]
        # 64 buckets -> ~13% standard error; assert a loose 2x band
        assert r["exact_distinct"] / 2 <= est <= r["exact_distinct"] * 2


def test_hll_registers_deterministic(spark):
    a = _build(spark, "events_hll_distinct").collect()
    b = _build(spark, "events_hll_distinct").collect()
    assert a == b


# ------------------------------------------------------------------ gram

def test_gram_matches_numpy(spark):
    rows = _build(spark, "embeddings_gram").collect()
    emb = np.array(
        [
            r["embedding"][:8]
            for r in load_table(spark, SF_DIR, "embeddings").collect()
        ],
        dtype=np.float64,
    )
    gram = emb.T @ emb
    assert len(rows) == 36
    for r in rows:
        # quantized-exact sum vs float64 accumulation: 1e-8 quantum x n rows
        assert abs(r["gram"] - gram[r["i"], r["j"]]) < 1e-4


# -------------------------------------------------------- bucketed join

def test_bucketed_gate_matches_plain_join(spark):
    got = {
        (r["c_mktsegment"], r["n_orders"], round(r["sum_price"], 6))
        for r in _build(spark, "customer_orders_bucketed").collect()
    }
    c = load_table(spark, SF_DIR, "customer")
    o = load_table(spark, SF_DIR, "orders")
    plain = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s"))
        .collect()
    )
    expect = {
        (r["c_mktsegment"], r["n"], round(r["s"], 6)) for r in plain
    }
    assert {g[:2] for g in got} == {e[:2] for e in expect}
    for g, e in zip(sorted(got), sorted(expect)):
        assert abs(g[2] - e[2]) < 1e-3


def test_bucketed_join_plan_has_no_join_exchange(spark):
    """The join itself must consume the bucketing: the only exchanges in
    the gate plan belong to the final aggregation/sort, not the join."""
    from datafusion_tpch_spark.operators.bucketing import bucketed_join

    _build(spark, "customer_orders_bucketed").collect()  # writes the tables
    import os

    pid = os.getpid()
    tag = SF_DIR.strip("/").replace("/", "_").replace(".", "_")
    j = bucketed_join(
        spark,
        f"gate_customer_b_{pid}_{tag}",
        f"gate_orders_b_{pid}_{tag}",
        ["custkey"],
    )
    assert exchange_count(j) == 0


# -------------------------------------------------------------- sketches

def test_cms_estimate_bounds(spark):
    rows = _build(spark, "token_cms_topk").collect()
    assert len(rows) == 20
    for r in rows:
        # count-min never underestimates; 4x512 counters on this corpus
        # keep collision inflation modest
        assert r["cms_est"] >= r["exact_count"]
        assert r["cms_est"] <= r["exact_count"] * 3


def test_rolling_kmv_tracks_exact(spark):
    rows = _build(spark, "events_rolling_kmv").collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_days_in_window"] <= 3
        lo, hi = r["exact_distinct"] * 0.5, r["exact_distinct"] * 2
        assert lo <= r["kmv_est"] <= hi
    # trailing-window distinct can never drop below the day's own count
    per_day = {r["day"]: r for r in rows}
    days = sorted(per_day)
    for d1, d2 in zip(days, days[1:]):
        assert per_day[d2]["n_days_in_window"] >= 1


# ------------------------------------------------------- window breadth

def test_window_suite_shares_one_window_exchange(spark):
    """Eight window functions over one spec must cost one hash exchange
    (plus the final presentation sort) — N analytics, one shuffle."""
    df = _build(spark, "customer_window_suite")
    assert exchange_count(df) <= 2
    rows = df.collect()
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r["c_nationkey"], []).append(r)
    for nk, grp in by_nation.items():
        grp.sort(key=lambda r: r["rn"])
        assert [r["rn"] for r in grp] == list(range(1, len(grp) + 1))
        # top row of each nation: max balance, rank stats at their floor
        assert grp[0]["prank"] == 0.0
        assert grp[0]["top_bal"] == grp[0]["c_acctbal"]
        for prev, cur in zip(grp, grp[1:]):
            assert cur["prev_bal"] == prev["c_acctbal"]
            assert cur["c_acctbal"] <= prev["c_acctbal"]


def test_running_total_monotone_per_order(spark):
    rows = _build(spark, "lineitem_running_total").collect()
    assert rows
    per = {}
    for r in rows:
        per.setdefault(r["l_orderkey"], []).append(r)
    for okey, grp in per.items():
        grp.sort(key=lambda r: r["l_linenumber"])
        cums = [r["cum_price"] for r in grp]
        assert cums == sorted(cums)  # prices positive -> monotone
        assert cums[0] > 0


# ----------------------------------------------- stateful sessions gate

def test_stateful_sessions_accounts_every_event(spark):
    rows = _build(spark, "events_stateful_sessions").collect()
    ev = load_table(spark, SF_DIR, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()
    assert len(rows) == ev.select("user_id").distinct().count()
    for r in rows:
        assert r["longest_session"] <= r["n_events"]
        assert r["n_sessions"] >= 1


# ------------------------------------------------- grouping sets / paths

def test_grouping_sets_levels_consistent(spark):
    rows = _build(spark, "lineitem_grouping_sets").collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    # (flag,status)=0, (flag)=1 with status rolled away, ()=3
    assert set(by_gid) == {0, 1, 3}
    total = next(iter(by_gid[3]))
    assert total["l_returnflag"] is None and total["l_linestatus"] is None
    assert sum(r["n_rows"] for r in by_gid[0]) == total["n_rows"]
    assert sum(r["n_rows"] for r in by_gid[1]) == total["n_rows"]
    assert abs(sum(r["sum_qty"] for r in by_gid[0]) - total["sum_qty"]) < 1e-6
    # every level-1 row aggregates exactly its level-0 rows
    lvl0 = {}
    for r in by_gid[0]:
        lvl0[r["l_returnflag"]] = lvl0.get(r["l_returnflag"], 0) + r["n_rows"]
    for r in by_gid[1]:
        assert r["l_linestatus"] is None
        assert lvl0[r["l_returnflag"]] == r["n_rows"]


def test_path_ngrams_counts_match_bruteforce(spark):
    rows = _build(spark, "events_path_ngrams").collect()
    assert 0 < len(rows) <= 20
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    # brute-force recount on the driver (fixture-sized only)
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    seqs = {}
    for r in ev:
        seqs.setdefault(r["user_id"], []).append((r["ts"], r["event_id"], r["event_type"]))
    counts = {}
    for trail in seqs.values():
        trail.sort()
        for a, b, c in zip(trail, trail[1:], trail[2:]):
            p = f"{a[2]}>{b[2]}>{c[2]}"
            counts[p] = counts.get(p, 0) + 1
    for r in rows:
        assert counts[r["path"]] == r["n"]
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: len(rows)]
    assert [(r["path"], r["n"]) for r in rows] == top


def test_interval_union_bounds(spark):
    rows = _build(spark, "events_interval_union").collect()
    ev = load_table(spark, SF_DIR, "events")
    assert len(rows) == ev.select("user_id").distinct().count()
    spans = {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(
            F.min(F.unix_millis("ts")).alias("lo"),
            F.max(
                F.unix_millis("ts")
                + F.greatest(F.floor(F.col("value") * 1000).cast("long"), F.lit(0).cast("long"))
            ).alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    for r in rows:
        s = spans[r["user_id"]]
        assert 0 <= r["covered_ms"] <= s["hi"] - s["lo"]
        assert 1 <= r["n_islands"] <= s["n"]


# ------------------------------------------------------- fused IVF-PQ

def test_ivf_pq_encode_matches_separate_kernels(spark):
    from datafusion_tpch_spark.operators.similarity import (
        ivf_assign,
        ivf_pq_encode,
        pq_encode,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    seeds = emb.orderBy("vec_id").limit(8).collect()
    centroids = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in seeds]
    d = len(centroids[0][1])
    sub = d // 4
    codebook = [
        [centroids[j][1][s * sub:(s + 1) * sub] for j in range(8)]
        for s in range(4)
    ]
    fused = {
        r["vec_id"]: (r["cell"], tuple(r["recon"]))
        for r in ivf_pq_encode(emb, centroids, codebook).collect()
    }
    cells = {r["vec_id"]: r["cell"] for r in ivf_assign(emb, centroids).collect()}
    recons = {
        r["vec_id"]: tuple(r["recon"])
        for r in pq_encode(emb, codebook).collect()
    }
    assert len(fused) == emb.count()
    for vid, (cell, recon) in fused.items():
        assert cells[vid] == cell
        assert recons[vid] == recon


# --------------------------------------- partitioned layout + pruning

def test_partitioned_prune_reads_one_month(spark):
    import os

    df = _build(spark, "orders_partitioned_prune")
    df.collect()  # materialize the partitioned layout
    tag = SF_DIR.strip("/").replace("/", "_")
    path = f"/tmp/spark_graft_orders_part_{os.getpid()}_{tag}"
    part = spark.read.parquet(path)
    all_files = set(part.inputFiles())
    assert len({f.rsplit("/", 2)[1] for f in all_files}) > 12  # many months
    filtered = part.filter(F.col("o_month") == "1995-03")
    # the month predicate must plan as a PartitionFilter on the scan (so
    # only the one directory is listed), not a row-level data filter
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "o_month" in pf.group(1)
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "o_month" not in pushed.group(1)
    # and the pruned read sees exactly the partition directory's rows
    one_dir = spark.read.parquet(f"{path}/o_month=1995-03")
    assert filtered.count() == one_dir.count() > 0


def test_hist_quantile_within_bin_width(spark):
    rows = _build(spark, "lineitem_hist_quantile_sketch").collect()
    li = load_table(spark, SF_DIR, "lineitem")
    import math

    for r in rows:
        vals = sorted(
            x["l_extendedprice"]
            for x in li.filter(F.col("l_returnflag") == r["flag"]).collect()
        )
        assert r["n_rows"] == len(vals)
        for q, col in ((0.5, "p50_edge"), (0.9, "p90_edge"), (0.99, "p99_edge")):
            exact = vals[math.ceil(q * len(vals)) - 1]
            # the sketch answers the bin lower edge: exact lies in the bin
            assert r[col] <= exact < r[col] + 2000


# ------------------------------------------------- containment / BPE

def test_containment_dominates_jaccard_and_is_directional(spark):
    cont = {
        (r["src"], r["dst"]): r for r in _build(spark, "docs_containment").collect()
    }
    assert cont
    for (s, d), r in cont.items():
        assert s != d
        assert 0.6 <= r["containment"] <= 1.0 + 1e-9
    jac = _build(spark, "dedup_ngram_jaccard")
    # containment(common/n1) >= jaccard(common/(n1+n2-common)) always
    for j in jac.collect():
        pair = (j["doc1"], j["doc2"])
        if pair in cont:
            assert cont[pair]["containment"] >= j["jaccard"] - 1e-9


def test_bpe_pairs_match_bruteforce(spark):
    import re

    rows = _build(spark, "docs_bpe_pairs").collect()
    docs = load_table(spark, SF_DIR, "documents").select("text").collect()
    freq = {}
    for r in docs:
        for w in re.split(r"[^a-z0-9]+", r["text"].lower()):
            if len(w) >= 2:
                freq[w] = freq.get(w, 0) + 1
    weights = {}
    nwords = {}
    for w, f in freq.items():
        seen = {}
        for i in range(len(w) - 1):
            p = w[i : i + 2]
            weights[p] = weights.get(p, 0) + f
            seen[p] = seen.get(p, 0) + 1
        for p in seen:
            nwords[p] = nwords.get(p, 0) + seen[p]
    top = sorted(weights.items(), key=lambda kv: (-kv[1], kv[0]))[: len(rows)]
    assert [(r["pair"], r["weight"]) for r in rows] == top
    for r in rows:
        assert r["n_words"] == nwords[r["pair"]]


# ------------------------------------------- batch-3: audio / eig / hll

def test_audio_energy_matches_bruteforce(spark):
    rows = {r["asset_id"]: r for r in _build(spark, "multimodal_audio_energy").collect()}
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    assert len(rows) == len(docs)
    for d in docs:
        b = d["text"].encode()
        sq = [(x - 128) ** 2 for x in b]
        frames = [sum(sq[i : i + 64]) for i in range(0, len(sq), 64)]
        r = rows[d["doc_id"]]
        assert r["n_samples"] == len(b)
        assert r["n_frames"] == len(frames)
        assert r["total_energy"] == sum(sq)
        peak = max(range(len(frames)), key=lambda i: (frames[i], -i))
        assert r["peak_frame"] == peak
        assert r["peak_energy"] == frames[peak]


def test_top_eigvec_matches_exact_reimplementation(spark):
    """Recompute the entire fixed-point pipeline (gram -> coarsen -> 8
    rescaled integer iterations -> integer projections -> top-5)
    independently in Python; the gate must match EXACTLY — this is the
    determinism claim the oracle also checks from SQL."""
    import math

    rows = _build(spark, "embeddings_top_eigvec").collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    emb = [
        (r["vec_id"], [float(x) for x in r["embedding"][:8]])
        for r in load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    ]
    d = 8
    gq = [[0] * d for _ in range(d)]
    for _, e in emb:
        for i in range(d):
            for j in range(d):
                gq[i][j] += math.floor(e[i] * e[j] * 1e8)
    g = [[math.floor(float(gq[i][j]) / 1e4) for j in range(d)] for i in range(d)]
    v = [10**6] * d
    for _ in range(8):
        w = [sum(g[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in w) or 1
        v = [math.floor(float(x) / float(m) * 1e6) for x in w]
    projs = [
        (vid, sum(math.floor(e[i] * 1000.0) * v[i] for i in range(d)))
        for vid, e in emb
    ]
    top = sorted(projs, key=lambda t: (-abs(t[1]), t[0]))[:5]
    assert [(r["vec_id"], r["proj"]) for r in rows] == top


def test_hll_stream_equals_batch_sketch(spark):
    stream = {r["event_type"]: r for r in _build(spark, "events_hll_stream").collect()}
    batch = {r["event_type"]: r for r in _build(spark, "events_hll_distinct").collect()}
    assert set(stream) == set(batch)
    for t, s in stream.items():
        b = batch[t]
        assert (s["m_used"], s["denom_scaled"], s["raw_est"]) == (
            b["m_used"], b["denom_scaled"], b["raw_est"]
        )


# ------------------------------------------- band join / late audit

def test_band_join_plans_as_broadcast_nested_loop(spark):
    df = _build(spark, "lineitem_band_join")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    rows = {r["band"]: r for r in df.collect()}
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_items"] for r in rows.values()) == li.count()
    # spot-check one band against a plain filter
    small = li.filter((F.col("l_quantity") >= 10) & (F.col("l_quantity") < 20))
    assert rows["small"]["n_items"] == small.count()


def test_late_audit_matches_bruteforce(spark):
    rows = {r["event_type"]: r for r in _build(spark, "events_late_audit").collect()}
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", "event_id", F.unix_millis("ts").alias("t"))
        .collect()
    )
    seqs = {}
    for r in ev:
        seqs.setdefault(r["event_type"], []).append((r["event_id"], r["t"]))
    for et, lst in seqs.items():
        lst.sort()
        hwm, n_late, max_lateness = None, 0, None
        for _, t in lst:
            if hwm is not None and t < hwm - 3_600_000:
                n_late += 1
                lateness = hwm - t
                max_lateness = max(max_lateness or 0, lateness)
            hwm = t if hwm is None else max(hwm, t)
        r = rows[et]
        assert r["n_events"] == len(lst)
        assert r["n_late"] == n_late
        assert r["max_lateness_ms"] == max_lateness


# ------------------------------------- join strategies / csv round-trip

def test_merge_join_plans_as_sort_merge(spark):
    df = _build(spark, "orders_lineitem_merge_join")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_hash_join_plans_as_shuffled_hash(spark):
    df = _build(spark, "orders_lineitem_hash_join")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_csv_roundtrip_preserves_rows(spark):
    import os

    _build(spark, "orders_csv_roundtrip").collect()
    tag = SF_DIR.strip("/").replace("/", "_")
    path = f"/tmp/spark_graft_orders_csv_{os.getpid()}_{tag}"
    fmt = "yyyy-MM-dd HH:mm:ss"
    back = (
        spark.read.schema(
            "o_orderkey long, o_custkey long, o_totalprice double, "
            "o_orderdate timestamp_ntz, o_orderpriority string, "
            "o_orderstatus string"
        )
        .option("header", True)
        .option("timestampFormat", fmt)
        .option("timestampNTZFormat", fmt)
        .csv(path)
    )
    o = load_table(spark, SF_DIR, "orders")
    assert back.count() == o.count()
    a = {tuple(r) for r in back.select("o_orderkey", "o_custkey", "o_orderdate").collect()}
    b = {tuple(r) for r in o.select("o_orderkey", "o_custkey", "o_orderdate").collect()}
    assert a == b


# ----------------------------------------------------------- k-means gate

def test_kmeans_members_cover_corpus_and_inertia_drops(spark):
    from datafusion_tpch_spark.operators.clustering import (
        inertia,
        kmeans_refine,
    )
    from datafusion_tpch_spark.operators.similarity import ivf_assign

    rows = _build(spark, "embeddings_kmeans").collect()
    emb = load_table(spark, SF_DIR, "embeddings")
    assert sum(r["n_members"] for r in rows) == emb.count()
    assert 1 <= len(rows) <= 4
    # Lloyd monotonicity: refined centroids give no worse an objective
    # than the raw seed assignment
    emb8 = emb.select("vec_id", F.slice(F.col("embedding"), 1, 8).alias("embedding"))
    seeds_rows = (
        emb8.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(4)
        .collect()
    )
    seeds = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in seeds_rows]
    seed_inertia = inertia(ivf_assign(emb8, seeds), seeds)
    cents, assigned = kmeans_refine(emb8, seeds, iters=2, exact=True)
    refined_inertia = inertia(assigned, cents)
    assert refined_inertia <= seed_inertia + 1e-6


def test_time_rollup_grains_telescope(spark):
    rows = _build(spark, "events_time_rollup").collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    # day=0, month=1, year=3, total=7
    assert set(by_gid) == {0, 1, 3, 7}
    total = by_gid[7][0]
    for gid in (0, 1, 3):
        assert sum(r["n_events"] for r in by_gid[gid]) == total["n_events"]
        assert abs(sum(r["sum_value"] for r in by_gid[gid]) - total["sum_value"]) < 1e-5
    # each month row telescopes its day rows
    per_month = {}
    for r in by_gid[0]:
        key = (r["y"], r["m"])
        per_month[key] = per_month.get(key, 0) + r["n_events"]
    for r in by_gid[1]:
        assert per_month[(r["y"], r["m"])] == r["n_events"]


# ---------------------------------- batch-5: communities / CDC / trending

def test_communities_form_partition_over_nodes(spark):
    rows = _build(spark, "events_communities").collect()
    nodes = {r["node"] for r in rows}
    labels = {r["label"] for r in rows}
    assert labels <= nodes  # a community exemplar is itself a node
    assert len(rows) == len(nodes)
    again = _build(spark, "events_communities").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_changelog_apply_roundtrip_is_exact(spark):
    r = _build(spark, "orders_changelog_apply").collect()[0]
    assert r["n_missing"] == 0
    assert r["n_extra"] == 0
    assert r["n_value_mismatch"] == 0
    o = load_table(spark, SF_DIR, "orders")
    n_a = o.count()
    n_del = o.filter(
        (F.col("o_orderkey") % 83 == 0) & (F.col("o_orderkey") % 101 != 0)
    ).count()
    n_ins = o.filter(F.col("o_orderkey") % 101 == 0).count()
    assert r["n_keys"] == n_a - n_del + n_ins  # |B|


def test_bm25_matches_bruteforce(spark):
    import re

    rows = _build(spark, "docs_bm25_topk").collect()
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    tf, dl, df = {}, {}, {}
    for d in docs:
        words = [w for w in re.split(r"[^a-z0-9]+", d["text"].lower()) if w]
        dl[d["doc_id"]] = len(words)
        seen = {}
        for w in words:
            seen[w] = seen.get(w, 0) + 1
        tf[d["doc_id"]] = seen
        for w in seen:
            df[w] = df.get(w, 0) + 1
    q = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    n = float(len(docs))
    avgdl = sum(dl.values()) / n
    import math

    scores = {}
    for did in dl:
        s = 0
        for term, dfreq in q:
            t = tf[did].get(term, 0)
            if t == 0:
                continue
            idf = (n - dfreq + 0.5) / (dfreq + 0.5)
            s += math.floor(
                idf * (t * 2.2) / (t + 1.2 * (0.25 + 0.75 * (dl[did] / avgdl)))
                * 1e8
            )
        scores[did] = s / 1e8
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[: len(rows)]
    got = [(r["doc_id"], round(r["score"], 6)) for r in rows]
    want = [(d, round(s, 6)) for d, s in top]
    assert got == want


def test_trending_stream_equals_batch(spark):
    rows = _build(spark, "events_trending_stream").collect()
    ev = load_table(spark, SF_DIR, "events")
    from pyspark.sql.window import Window

    counts = (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events")
    )
    w = Window.partitionBy("win_start").orderBy(
        F.col("n_events").desc(), "event_type"
    )
    batch = (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .collect()
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, batch))


# --------------------------------------------- bitmap / multi-probe

def test_user_bitmap_popcount_equals_exact(spark):
    rows = _build(spark, "events_user_bitmap").collect()
    assert rows
    for r in rows:
        assert r["bitmap_distinct"] == r["exact_distinct"]
        assert r["n_words"] <= r["exact_distinct"]  # words <= set bits


def test_simhash_hamming1_matches_bruteforce(spark):
    got = {
        (r["doc1"], r["doc2"]): r["hamming"]
        for r in all_queries()["dedup_simhash_hamming1"].build(spark, SF_DIR).collect()
    }
    sims = {
        r["doc_id"]: r["simhash"]
        for r in all_queries()["dedup_simhash"].build(spark, SF_DIR).collect()
    }
    ids = sorted(sims)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sims[a] ^ sims[b]).count("1")
            if h <= 1:
                want[(a, b)] = h
    assert got == want and got


# ------------------------------------------- partition-parallel plan shapes

def _global_window_count(df) -> int:
    """Windows whose spec has no partition column (first windowspecdefinition
    argument is an ORDER column) — each one serializes all rows through a
    single task, the shape the round-4 rewrites removed."""
    import re

    from datafusion_tpch_spark.plans import plan_string

    plan = plan_string(df)
    n = 0
    for m in re.finditer(r"windowspecdefinition\(([^,]+),", plan):
        first = m.group(1)
        if " ASC" in first or " DESC" in first:
            n += 1
    return n


def test_skyline_and_ring_windows_are_partitioned(spark):
    for name in ("part_skyline", "docs_negative_pairs"):
        df = _build(spark, name)
        assert _global_window_count(df) == 0, name


def test_kmv_plans_have_no_windows(spark):
    """The two-level salted k-min is pure aggregation: the per-group
    sort-window it replaced must not reappear."""
    from datafusion_tpch_spark.plans import plan_string

    for name in ("events_kmv_distinct", "events_kmv_setops"):
        assert "Window" not in plan_string(_build(spark, name)), name


def test_two_level_kmin_equals_global_kmin():
    """Property: per-salt k-min partials, unioned and re-truncated, give
    exactly the k smallest distinct hashes — the mergeability claim the
    KMV sketch plans rely on."""
    import numpy as np

    rng = np.random.default_rng(7)
    k, nsalt = 64, 64
    for n in (10, 100, 5000):
        hashes = np.unique(rng.integers(0, 2**62, size=n))
        global_kmin = sorted(hashes)[:k]
        partials = []
        for s in range(nsalt):
            shard = sorted(h for h in hashes if h % nsalt == s)[:k]
            partials.extend(shard)
        assert sorted(partials)[:k] == global_kmin


# Global (unpartitioned) windows are allowed ONLY over bounded aggregate
# tables — vocabulary, day/month grids, dimension aggregates — never over
# raw data-sized input.  This allowlist pins the audited set; a new query
# adding a global window must be reviewed for input boundedness and added
# here explicitly.
_BOUNDED_GLOBAL_WINDOWS = {
    "docs_bm25_topk": 1,       # top-k budget rows (rank AFTER TakeOrdered;
                               # the term-selection window became a
                               # TakeOrdered in round 6)
    "docs_bpe_pairs": 1,       # adjacent-pair vocabulary table
    "docs_dsir_score": 1,      # top-k budget rows (rank AFTER TakeOrdered)
    "embeddings_top_eigvec": 1,  # d-row eigenvector table
    "events_path_ngrams": 1,   # |types|^3 trigram table
    "events_rolling_kmv": 2,   # per-day sketch table (bounded day grid)
    "orders_seasonality": 2,   # month grid (centered moving average)
    "q15_window": 1,           # per-supplier aggregate (dimension-sized)
}


def test_global_windows_only_on_bounded_inputs(spark):
    got = {}
    errors = {}
    for name, spec in all_queries().items():
        try:
            n = _global_window_count(spec.build(spark, SF_DIR))
        except Exception as e:  # noqa: BLE001
            errors[name] = repr(e)[:120]
            continue
        if n:
            got[name] = n
    # a query whose build fails must FAIL the audit, not vanish from it
    assert not errors, errors
    assert got == _BOUNDED_GLOBAL_WINDOWS


def test_ewma_matches_reference_recursion(spark):
    """The lag-weighted integer formulation must equal the textbook
    truncated adjusted EWMA computed independently in Python over the
    same daily series."""
    from datafusion_tpch_spark.queries.advanced import (
        _EWMA_Q,
        _EWMA_TAPS,
        _EWMA_W,
    )

    got = {
        (r.event_type, r.day): r.ewma_value
        for r in _build(spark, "events_ewma_daily").collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("value").cast("double") * float(_EWMA_Q)).cast(
                    "decimal(38,0)"
                )
            ).alias("xq")
        )
        .collect()
    )
    series: dict[str, list] = {}
    for r in sorted(daily, key=lambda r: (r.event_type, r.day)):
        series.setdefault(r.event_type, []).append((r.day, int(r.xq)))
    assert got and series
    for etype, pts in series.items():
        for day_t, _ in pts:
            num = den = 0
            for day_s, x_s in pts:
                gap = (day_t - day_s).days
                if 0 <= gap < _EWMA_TAPS:
                    num += _EWMA_W[gap] * x_s
                    den += _EWMA_W[gap]
            want = float(num) / float(den) / float(_EWMA_Q)
            assert got[(etype, day_t)] == want, (etype, day_t)


def test_ewma_decays_by_calendar_distance_not_row_offset(spark):
    """A missing day must decay its predecessors by the REAL day gap: a
    2-day-old observation gets weight (3/4)^2 even when it is the
    immediately preceding row."""
    import datetime

    from datafusion_tpch_spark.queries.advanced import _EWMA_Q, _EWMA_W

    rows = [
        ("x", datetime.datetime(2024, 1, 1), 4.0),
        # no events on Jan 2
        ("x", datetime.datetime(2024, 1, 3), 8.0),
    ]
    ev = spark.createDataFrame(
        [(i, ts, 1, t, v, "{}") for i, (t, ts, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import datafusion_tpch_spark.queries.advanced as adv

    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(
            F.floor(F.col("value").cast("double") * float(_EWMA_Q)).cast(
                "decimal(38,0)"
            )
        ).alias("xq")
    )
    # drive the gate body directly over this toy table by monkeypatching
    # the loader boundary: simplest is to recompute with the same algebra
    t = daily.select(F.col("event_type").alias("tt"), F.col("day").alias("td"))
    s = daily.select(
        F.col("event_type").alias("st"),
        F.col("day").alias("sd"),
        F.col("xq").alias("sx"),
    )
    gap = F.datediff(F.col("td"), F.col("sd"))
    w_arr = F.array(*[F.lit(w) for w in _EWMA_W])
    wgt = F.element_at(w_arr, gap + 1)
    out = {
        (r.tt, r.td.day): r.ewma
        for r in t.join(s, (F.col("tt") == F.col("st")) & gap.between(0, 7))
        .groupBy("tt", "td")
        .agg(
            (
                F.sum(wgt.cast("decimal(38,0)") * F.col("sx")).cast("double")
                / F.sum(wgt).cast("double")
                / float(_EWMA_Q)
            ).alias("ewma")
        )
        .collect()
    }
    # Jan 3: gap to Jan 1 is 2 days -> weights W[0]=16384 (self), W[2]=9216
    want = (16384 * 8.0 + 9216 * 4.0) / (16384 + 9216)
    assert out[("x", 3)] == want
    assert out[("x", 1)] == 4.0
