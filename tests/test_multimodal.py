"""Multimodal operator tests: binary columns + mapInPandas kernels."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from datafusion_tpch_spark.operators.multimodal import (
    _PX_K,
    asset_pixel_stats,
    documents_as_assets,
    extract_image_features,
    resize_images,
    synthetic_assets,
)
from datafusion_tpch_spark.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_extract_features_shape_and_determinism(spark):
    assets = synthetic_assets(spark, n=16)
    feats = extract_image_features(assets).orderBy("asset_id")
    rows = feats.collect()
    assert len(rows) == 16
    assert rows[0].asset_id == 0
    assert all(len(r.phash) == 64 for r in rows)
    # deterministic across runs
    again = extract_image_features(assets).orderBy("asset_id").collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_resize_output_bytes(spark):
    assets = synthetic_assets(spark, n=4)
    small = resize_images(assets, target=(16, 16)).collect()
    assert all(len(r.content) == 16 * 16 for r in small)
    assert all(r.height == 16 and r.width == 16 for r in small)


def test_sample_frames_fanout(spark):
    from datafusion_tpch_spark.operators.multimodal import sample_frames

    base = synthetic_assets(spark, n=6)
    # give them video durations: asset i -> (i+1) seconds
    vids = base.withColumn(
        "duration_ms", (F.col("asset_id") + 1) * 1000
    ).withColumn("modality", F.lit("video"))
    frames = sample_frames(vids, every_ms=1000, frame_bytes=32).collect()
    # asset i yields i+1 frames
    per_asset = {}
    for r in frames:
        per_asset.setdefault(r.asset_id, []).append(r)
    assert {a: len(v) for a, v in per_asset.items()} == {i: i + 1 for i in range(6)}
    for rows in per_asset.values():
        assert [r.frame_idx for r in sorted(rows, key=lambda x: x.frame_idx)] == list(
            range(len(rows))
        )
        assert all(len(r.frame) == 32 for r in rows)
        assert all(r.ts_ms == r.frame_idx * 1000 for r in rows)


def test_documents_as_assets_binary_roundtrip(spark):
    docs = load_table(spark, SF_DIR, "documents")
    assets = documents_as_assets(docs)
    # blob length == UTF-8 byte length of the text, computed two ways
    chk = assets.join(docs, assets.asset_id == docs.doc_id).select(
        (F.length(F.col("content")) == F.octet_length(F.col("text"))).alias("ok")
    )
    assert chk.filter(~F.col("ok")).count() == 0


def test_pixel_stats_against_numpy(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(8)
    stats = asset_pixel_stats(documents_as_assets(docs)).orderBy("asset_id").collect()
    for r in stats:
        w = 8 + r.asset_id % 9
        h = 8 + r.asset_id % 7
        px = (r.asset_id * _PX_K + np.arange(w * h, dtype=np.int64)) % 256
        assert r.sum_px == int(px.sum())
        assert r.max_px == int(px.max())
        assert abs(r.mean_px - float(px.mean())) < 1e-12


def test_partition_for_blobs_bounds_partition_rows(spark):
    """Every output partition must hold <= target rows (the executor-memory
    guarantee the docstring promises for decode pipelines)."""
    from datafusion_tpch_spark.operators.multimodal import partition_for_blobs

    docs = load_table(spark, SF_DIR, "documents").limit(200)
    out = partition_for_blobs(docs, target_rows_per_partition=10)
    sizes = out.rdd.glom().map(len).collect()
    assert sum(sizes) == 200
    assert max(sizes) <= 10, sizes

    import pytest

    with pytest.raises(ValueError):
        partition_for_blobs(docs, target_rows_per_partition=0)
