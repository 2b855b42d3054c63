"""The scale-path dedup pipeline (LSH candidates → exact verify) composes
and agrees with the exact all-pairs baseline; kernel implementations agree
with each other."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_tpch_spark.catalog import load_table
from datafusion_tpch_spark.operators.dedup import (
    exact_survivors,
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_signatures,
)
from datafusion_tpch_spark.operators.similarity import topk_cosine
from datafusion_tpch_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


def test_exact_survivors_counts(spark):
    docs = load_table(spark, SF_DIR, "documents")
    surv = exact_survivors(docs)
    n_docs, n_surv = docs.count(), surv.count()
    assert 0 < n_surv <= n_docs
    # survivors are distinct by fingerprint: re-dedup is a fixpoint
    assert exact_survivors(surv).count() == n_surv


def test_lsh_then_verify_matches_exact_on_candidates(spark):
    """verify(LSH candidates) == exact ngram pairs ∩ candidates, and
    recall over the exact pairs is high on the fixture corpus."""
    docs = load_table(spark, SF_DIR, "documents")
    sig = minhash_signatures(docs)
    cands = lsh_candidate_pairs(sig)
    verified = jaccard_verify(docs, cands).select("id1", "id2")

    exact = (
        all_queries()["dedup_ngram_jaccard"]
        .build(spark, SF_DIR)
        .select(F.col("doc1").alias("id1"), F.col("doc2").alias("id2"))
    )
    # soundness: every verified pair is an exact near-dup pair
    assert verified.exceptAll(exact).count() == 0
    # recall: banding (4x4 of 16) finds most true pairs on this corpus
    n_exact = exact.count()
    n_found = exact.join(verified, ["id1", "id2"], "left_semi").count()
    assert n_exact == 0 or n_found / n_exact >= 0.8, (n_found, n_exact)


def test_topk_kernel_agrees_with_jvm_expression_query(spark):
    """The numpy mapInPandas top-k and the JVM-expression ann_bruteforce
    query compute the same quantized cosine — identical (id, rank, value)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    got = (
        topk_cosine(emb, query_ids=list(range(8)), k=5)
        .select("query_id", "cand_id", "cos_sim", "rank")
        .collect()
    )
    want = all_queries()["ann_bruteforce_topk"].build(spark, SF_DIR).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_srp_band_buckets_band0_matches_srp_bucket(spark):
    """The banded kernel's band 0 equals the single-band srp_bucket over the
    same planes — one code path's buckets validate the other's."""
    import hashlib

    from datafusion_tpch_spark.operators.similarity import (
        srp_band_buckets,
        srp_bucket,
    )

    def sign(p, d):
        h = int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:15], 16)
        return 1 if h % 2 == 0 else -1

    signs = [[sign(p, d) for d in range(64)] for p in range(8)]
    emb = load_table(spark, SF_DIR, "embeddings")
    banded = {
        r.vec_id: list(r.buckets)
        for r in srp_band_buckets(emb, signs, 2).collect()
    }
    single = {r.vec_id: r.bucket for r in srp_bucket(emb, signs[:4]).collect()}
    assert {k: v[0] for k, v in banded.items()} == single
    assert all(len(v) == 2 for v in banded.values())


def test_semantic_dedup_sound_and_recalls(spark):
    """dedup_semantic (banded SRP candidates + exact verify) returns only
    true >=threshold pairs (soundness) and finds most of them (recall)."""
    sem = all_queries()["dedup_semantic"].build(spark, SF_DIR).select("id1", "id2")
    exact = (
        all_queries()["dedup_embedding_cosine"].build(spark, SF_DIR).select("id1", "id2")
    )
    assert sem.exceptAll(exact).count() == 0
    n_exact, n_found = exact.count(), exact.join(sem, ["id1", "id2"], "left_semi").count()
    # 8x6 banding at the fixture's loose 0.40 threshold: ~0.35 recall
    # (a production 0.9+ near-dup threshold recalls far higher — the
    # extensions.py parameter-scaling note derives both)
    assert n_exact == 0 or n_found / n_exact >= 0.3, (n_found, n_exact)


def test_incremental_lsh_consistent_with_raw_buckets(spark):
    """Admission verdicts recomputed independently from the raw bucket
    table: an incoming doc is kept iff it shares no (band, bkey) cell
    with a corpus cell whose CORPUS occupancy is within the cap — the
    verdict must depend on the corpus index alone, never on what else
    happens to be in the incoming batch."""
    from collections import Counter

    from datafusion_tpch_spark.queries.extensions import (
        _INCR_SPLIT,
        _LSH_MAX_BUCKET,
        _lsh_buckets_raw,
    )

    reg = all_queries()
    verdicts = {
        r["doc_id"]: (r["kept"], r["n_hit_buckets"])
        for r in reg["dedup_incremental_lsh"].build(spark, SF_DIR).collect()
    }
    assert verdicts
    # both admission outcomes must be exercised by the fixture
    assert any(k for k, _ in verdicts.values())
    assert any(not k for k, _ in verdicts.values()), (
        "no incoming doc collides with the corpus index; the rejection "
        "path is untested"
    )
    raw = _lsh_buckets_raw(spark, SF_DIR).collect()
    corpus_occ = Counter(
        (r["band"], r["bkey"]) for r in raw if r["doc_id"] < _INCR_SPLIT
    )
    index = {c for c, n in corpus_occ.items() if n <= _LSH_MAX_BUCKET}
    expected_hits = Counter(
        r["doc_id"]
        for r in raw
        if r["doc_id"] >= _INCR_SPLIT and (r["band"], r["bkey"]) in index
    )
    for doc_id, (kept, n_hits) in verdicts.items():
        assert n_hits == expected_hits.get(doc_id, 0), (doc_id, n_hits)
        assert kept == (n_hits == 0)


def test_pairwise_cosine_baseline_cap_enforced(spark):
    """The exact all-pairs baseline must refuse oversized block-pair
    tasks (the mechanical guard that keeps it a labeled verification
    baseline, not an accidental production path) — and pass untouched
    when under the cap."""
    import pytest

    from datafusion_tpch_spark.operators.similarity import pairwise_cosine

    emb = load_table(spark, SF_DIR, "embeddings").limit(64)
    ok = pairwise_cosine(emb, "vec_id", "embedding", 0.4, n_blocks=2)
    assert ok.count() >= 0  # under the default cap: runs fine
    with pytest.raises(Exception, match="max_pairs_per_task"):
        pairwise_cosine(
            emb, "vec_id", "embedding", 0.4, n_blocks=2, max_pairs_per_task=10
        ).count()


def test_ann_recall_audit_ivf_meets_slo(spark):
    """The trained-IVF row of ann_recall_audit meets the engineered SLO
    on the fixture — recall@5 >= 0.6 at <= 25% candidate fraction — and
    strictly beats the SRP geometry (the round-10 weak spot the trained
    index exists to fix).  Thresholds are the audit's contract, so a
    regression in the index build or probe ladder fails HERE, not in a
    notebook."""
    rows = {
        r["method"]: r
        for r in all_queries()["ann_recall_audit"]
        .build(spark, SF_DIR)
        .collect()
    }
    ivf, srp = rows["ivf"], rows["srp"]
    assert ivf["recall_at_k"] >= 0.6, ivf
    assert ivf["cand_frac"] <= 0.25, ivf
    assert ivf["recall_at_k"] > srp["recall_at_k"]
    # every query gets a non-empty result (dense top-k, no starved query)
    assert ivf["min_hits_per_query"] >= 1
