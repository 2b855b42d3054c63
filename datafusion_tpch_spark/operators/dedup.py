"""Deduplication operators as reusable DataFrame transforms.

These are the programmatic API behind queries.extensions' dedup queries:
each takes/returns DataFrames so they compose into pipelines over any
document table, not just the fixtures.  All are shuffle-bounded (group-bys
and bucket joins — never an unbounded cross join), which is the property
that matters at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing, text


def exact_survivors(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep one row (min id) per normalized-text fingerprint. One shuffle."""
    fp = text.fingerprint(F.col(text_col)).alias("fp")
    ranked = docs.select(F.col(id_col), fp)
    keep = ranked.groupBy("fp").agg(F.min(id_col).alias(id_col))
    return docs.join(keep, id_col, "left_semi")


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, m0..m{k-1}) minhash signatures; one explode + one group-by."""
    sh = docs.select(
        F.col(id_col),
        F.explode(text.shingles(F.col(text_col), shingle_n)).alias("shingle"),
    ).withColumn("h", hashing.md5_int(F.col("shingle"))).select(id_col, "h").distinct()
    aggs = [
        F.min(hashing.minhash_col(F.col("h"), a, b)).alias(f"m{i}")
        for i, (a, b) in enumerate(hashing.perm_params(k))
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str = "doc_id", k: int = 16, bands: int = 4
) -> DataFrame:
    """Band the signature into ``bands`` buckets; candidate pairs agree on
    at least one full band. The self-join is a bucket equi-join — fan-out
    bounded by bucket size, not corpus size."""
    rows = k // bands
    # one struct-array explode, not a bands-way union: the union form
    # re-evaluates the signature input once per band
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.md5(
                    F.concat_ws(
                        "_",
                        *[F.col(f"m{band * rows + r}").cast("string") for r in range(rows)],
                    )
                ).alias("bkey"),
            )
            for band in range(bands)
        ]
    )
    buckets = signatures.select(F.col(id_col), F.explode(band_structs).alias("b")).select(
        id_col, F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2"))
        .distinct()
    )


def jaccard_verify(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.35,
) -> DataFrame:
    """Exact Jaccard on candidate pairs only (the verify step after LSH)."""
    sh = docs.select(
        F.col(id_col),
        F.explode(text.shingles(F.col(text_col), shingle_n)).alias("shingle"),
    ).withColumn("h", hashing.md5_int(F.col("shingle"))).select(id_col, "h").distinct()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id1"), F.col("h"))
    b = sh.select(F.col(id_col).alias("id2"), F.col("h"))
    common = (
        pairs.join(a, "id1").join(b, ["id2", "h"])
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    s1 = sizes.select(F.col(id_col).alias("id1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col(id_col).alias("id2"), F.col("n_sh").alias("n2"))
    jac = F.col("common") / (F.col("n1") + F.col("n2") - F.col("common"))
    return (
        common.join(s1, "id1").join(s2, "id2")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
    )
