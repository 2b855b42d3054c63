"""Distributed k-means refinement: Lloyd iterations from the IVF gate's
deterministic seeds must monotonically tighten the objective, keep k
constant, and stay reproducible."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_tpch_spark.catalog import load_table
from datafusion_tpch_spark.operators.clustering import inertia, kmeans_refine

SF_DIR = "/root/testdata/sf0.001"
K = 8


def _seeds(emb):
    return [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(K)
        .collect()
    ]


def test_refinement_tightens_objective(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    seeds = _seeds(emb)
    from datafusion_tpch_spark.operators.similarity import ivf_assign

    before = inertia(ivf_assign(emb, seeds), seeds)
    cents, assigned = kmeans_refine(emb, seeds, iters=3)
    after = inertia(assigned, cents)
    assert after <= before  # Lloyd never increases the objective
    assert len(cents) == K  # empty-cell fallback keeps k constant
    # every corpus vector is assigned to a live centroid
    assert assigned.count() == emb.count()
    cell_ids = {cid for cid, _ in cents}
    assert {
        r["cell"] for r in assigned.select("cell").distinct().collect()
    } <= cell_ids


def test_refinement_deterministic(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    seeds = _seeds(emb)
    c1, _ = kmeans_refine(emb, seeds, iters=2)
    c2, _ = kmeans_refine(emb, seeds, iters=2)
    assert c1 == c2


# ---------------------------------------------------------------------------
# pq_encode (product quantization)
# ---------------------------------------------------------------------------

import numpy as np

from datafusion_tpch_spark.operators.similarity import pq_encode


def test_pq_encode_reconstruction_is_codebook_rows(spark):
    # 4-dim vectors, 2 subspaces x 2 dims, 2 codebook entries per subspace
    cb = [
        [[0.0, 0.0], [1.0, 1.0]],      # subspace 0
        [[0.0, 1.0], [1.0, 0.0]],      # subspace 1
    ]
    rows = [
        (1, [0.1, -0.1, 0.1, 0.9]),    # -> cb[0][0] ++ cb[1][0]
        (2, [0.9, 1.1, 0.9, 0.1]),     # -> cb[0][1] ++ cb[1][1]
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.recon for r in pq_encode(df, cb).collect()}
    assert np.allclose(got[1], [0.0, 0.0, 0.0, 1.0])
    assert np.allclose(got[2], [1.0, 1.0, 1.0, 0.0])


def test_pq_encode_tie_breaks_to_smallest_code(spark):
    # equidistant from both entries -> code 0 wins in every subspace
    cb = [[[1.0, 0.0], [0.0, 1.0]], [[2.0, 2.0], [2.0, 2.0]]]
    df = spark.createDataFrame(
        [(7, [0.5, 0.5, 2.0, 2.0])], "vec_id long, embedding array<float>"
    )
    (row,) = pq_encode(df, cb).collect()
    assert list(row.recon) == [1.0, 0.0, 2.0, 2.0]
