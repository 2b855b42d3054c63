"""Semantic properties of the training-corpus curation gates
(queries/curation.py) beyond the cross-engine hash check the oracle gate
provides: invariants that must hold for any corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_tpch_spark.catalog import load_table
from datafusion_tpch_spark.queries import all_queries
from datafusion_tpch_spark.queries.curation import (
    _DECON_EVAL_MOD,
    _PACK_LEN,
)

SF_DIR = "/root/testdata/sf0.001"


def _q(spark, name):
    return all_queries()[name].build(spark, SF_DIR)


def test_decontaminate_never_flags_eval_docs(spark):
    flagged = _q(spark, "docs_decontaminate")
    assert (
        flagged.filter(F.col("doc_id") % _DECON_EVAL_MOD == 0).count() == 0
    )
    # every flagged doc shares at least one n-gram
    assert flagged.filter(F.col("n_shared") < 1).count() == 0


def test_token_pack_conserves_tokens(spark):
    docs = load_table(spark, SF_DIR, "documents")
    from datafusion_tpch_spark.functions.text import token_count

    total = docs.select(F.sum(token_count(F.col("text")))).collect()[0][0]
    packed = _q(spark, "docs_token_pack")
    agg = packed.agg(
        F.sum("seq_tokens").alias("tok"), F.sum("n_docs").alias("docs")
    ).collect()[0]
    assert agg["tok"] == total            # no token lost or duplicated
    assert agg["docs"] == docs.count()    # every doc packed exactly once
    # a sequence overfills by at most one doc's tokens (doc assigned where
    # it starts), so any seq except a source's last holds >= PACK_LEN - max_doc
    assert packed.filter(F.col("seq_tokens") <= 0).count() == 0


def test_boilerplate_strip_bounds(spark):
    res = _q(spark, "docs_boilerplate_strip")
    assert res.filter(
        (F.col("n_after") > F.col("n_before"))
        | (F.col("kept_ratio") < 0)
        | (F.col("kept_ratio") > 1)
    ).count() == 0
    docs = load_table(spark, SF_DIR, "documents")
    assert res.count() == docs.count()    # audit row per doc, always


def test_repetition_ratio_in_unit_interval(spark):
    rep = _q(spark, "docs_repetition")
    assert rep.filter(
        (F.col("rep_ratio") < 0)
        | (F.col("rep_ratio") > 1)
        | (F.col("distinct_ngrams") > F.col("total_ngrams"))
    ).count() == 0


def test_mixture_weights_shares_sum_to_one(spark):
    mw = _q(spark, "docs_mixture_weights").collect()
    assert abs(sum(r["corpus_share"] for r in mw) - 1.0) < 1e-9
    assert abs(sum(r["target_share"] for r in mw) - 1.0) < 1e-9
    for r in mw:
        # weight * corpus_share recovers the uniform target exactly
        assert abs(r["weight"] * r["corpus_share"] - r["target_share"]) < 1e-12


def test_pii_scrub_redacts_every_payload_with_id(spark):
    ev = load_table(spark, SF_DIR, "events")
    res = _q(spark, "events_pii_scrub")
    agg = res.agg(
        F.sum("n_events").alias("n"), F.sum("n_redacted").alias("r")
    ).collect()[0]
    assert agg["n"] == ev.count()
    # the fixture's props always carry a numeric id -> all rows redacted
    with_id = ev.filter(F.col("props").rlike(r'"k":\s*\d+')).count()
    assert agg["r"] == with_id
    # scrubbed output must contain no digit runs in the id position
    from datafusion_tpch_spark.queries.curation import _PII_RE, _PII_SUB

    leftover = ev.select(
        F.regexp_replace("props", _PII_RE, _PII_SUB).alias("s")
    ).filter(F.col("s").rlike(_PII_RE))
    assert leftover.count() == 0


def test_mixture_sample_moves_toward_uniform(spark):
    res = _q(spark, "docs_mixture_sample").collect()
    for r in res:
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert 0 <= r["keep_ppm"] <= 1_000_000
    # re-running yields the identical sample (hash-deterministic, no RNG)
    again = {(r["source"], r["n_kept"]) for r in
             _q(spark, "docs_mixture_sample").collect()}
    assert {(r["source"], r["n_kept"]) for r in res} == again


def test_pack_len_constant_sane():
    assert _PACK_LEN > 0


# ------------------------------------------- reservoir sample / A/B lift

def test_reservoir_sample_fixed_size_per_lang(spark):
    from datafusion_tpch_spark.catalog import load_table

    rows = _q(spark, "docs_reservoir_sample").collect()
    docs = load_table(spark, SF_DIR, "documents")
    per_lang = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {}
    for r in rows:
        got.setdefault(r["lang"], []).append(r["rank"])
    assert set(got) == set(per_lang)
    for lang, ranks in got.items():
        want = min(20, per_lang[lang])
        assert sorted(ranks) == list(range(1, want + 1))
    # determinism: same sample on re-run
    again = _q(spark, "docs_reservoir_sample").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_ab_lift_arms_partition_users(spark):
    from datafusion_tpch_spark.catalog import load_table

    rows = {r["arm"]: r for r in _q(spark, "events_ab_lift").collect()}
    ev = load_table(spark, SF_DIR, "events")
    assert set(rows) == {0, 1}
    total_users = ev.select("user_id").distinct().count()
    assert rows[0]["n_users"] + rows[1]["n_users"] == total_users
    for r in rows.values():
        assert 0 <= r["n_purchased"] <= r["n_clicked"] <= r["n_users"]
        # conv_q6 is floor(purchased/clicked * 1e6)
        import math

        assert r["conv_q6"] == math.floor(
            r["n_purchased"] / r["n_clicked"] * 1e6
        )


# ----------------------------------- negative sampling / feature hashing

def test_negative_pairs_shape_and_determinism(spark):
    rows = _q(spark, "docs_negative_pairs").collect()
    from datafusion_tpch_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    # at most k=2 draws per anchor, self-pairs dropped, partners real docs
    per = {}
    for r in rows:
        assert r["doc_id"] != r["partner_id"]
        assert r["partner_id"] in ids
        per.setdefault(r["doc_id"], set()).add(r["draw"])
    assert len(rows) <= 2 * n
    assert len(rows) >= 2 * n - 2 * len(ids) // 10  # few self-collisions
    again = _q(spark, "docs_negative_pairs").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_feature_hash_census_accounts_all_pairs(spark):
    rows = _q(spark, "events_feature_hash").collect()
    from datafusion_tpch_spark.catalog import load_table

    ev = load_table(spark, SF_DIR, "events")
    # props is a single-key object per event -> one pair per event
    assert sum(r["n_hits"] for r in rows) == ev.count()
    for r in rows:
        assert 0 <= r["bucket"] < 32
        assert 1 <= r["n_types"] <= 5


def test_bpe_encode_matches_python_reference(spark):
    """The Spark fold-encode must equal an independent pure-Python BPE
    apply (learn top-K char-pair merges over the word-frequency table,
    apply in rank order with the leftmost non-overlapping scan)."""
    import collections
    import re

    from datafusion_tpch_spark.queries.curation import _BPE_ENC_K

    docs = load_table(spark, SF_DIR, "documents")
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]

    def words(t):
        return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]

    freq = collections.Counter()
    for _, t in rows:
        for w in words(t):
            freq[w] += 1
    pair_w = collections.Counter()
    for w, f in freq.items():
        if len(w) >= 2:
            for i in range(len(w) - 1):
                pair_w[w[i : i + 2]] += f
    merges = [
        p for p, _ in sorted(pair_w.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:_BPE_ENC_K]

    def encode(w):
        syms = list(w)
        for p in merges:
            out = []
            for s in syms:
                if out and out[-1] == p[0] and s == p[1]:
                    out[-1] = p  # merge the leftmost eligible pair
                else:
                    out.append(s)
            syms = out
        return syms

    expect = {
        did: (len(words(t)), sum(len(encode(w)) for w in words(t)))
        for did, t in rows
    }
    corpus = sum(v[1] for v in expect.values())
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["corpus_tokens"])
        for r in _q(spark, "docs_bpe_encode").collect()
    }
    assert set(got) == set(expect)
    for did, (nw, nt) in expect.items():
        assert got[did][:2] == (nw, nt), (did, got[did], (nw, nt))
        assert got[did][2] == corpus


def test_bpe_fold_semantics_hand_worked(spark):
    """Pin the Spark fold expression itself on hand-worked words: rank
    order (not positional order) decides which of two blocking merges
    wins, and same-char runs merge leftmost non-overlapping."""
    from datafusion_tpch_spark.inline import inline_table
    from datafusion_tpch_spark.queries.curation import _bpe_token_count

    cases = [
        # (word, merges, expected token count)
        ("abc", ["bc", "ab"], 2),      # [a, bc]
        ("abc", ["ab", "bc"], 2),      # [ab, c]
        ("aabb", ["ab", "aa", "bb"], 3),  # ab first blocks both: [a, ab, b]
        ("aabb", ["aa", "bb", "ab"], 2),  # [aa, bb]
        ("aaaa", ["aa"], 2),           # leftmost non-overlap: [aa, aa]
        ("aaa", ["aa"], 2),            # [aa, a]
        ("abab", ["ab"], 2),           # [ab, ab]
        ("x", ["ab"], 1),              # 1-char word: 1 token
    ]
    for word, merges, want in cases:
        df = inline_table(spark, [(word,)], "w string").select(
            _bpe_token_count(F.col("w"), merges).alias("n")
        )
        assert df.collect()[0]["n"] == want, (word, merges, want)


def test_exact_substring_dedup_semantics(spark, tmp_path):
    """Hand-built corpus with known duplicated 8-token spans: a span
    shared across two docs, a span repeated WITHIN one doc (the case
    whole-doc dedup misses), and a doc too short to carry any span."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datafusion_tpch_spark.queries.curation import (
        docs_exact_substring_dedup,
    )

    span = "one two three four five six seven eight"      # exactly 8 tokens
    docs = [
        # doc 0: the span + unique tail -> spans at pos 1..4; only pos 1's
        # gram (the span itself) recurs (in doc 1)
        (0, span + " tail0 tail1 tail2"),
        # doc 1: unique head + the span -> 4 spans, last one duplicated
        (1, "head0 head1 head2 " + span),
        # doc 2: the span twice back-to-back -> internal repetition;
        # 9 spans, the two copies of the span itself are both duplicated
        (2, span + " " + span),
        # doc 3: too short for any 8-gram
        (3, "just five little words here"),
    ]
    table = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
        "lang": pa.array(["en"] * 4, pa.string()),
        "source": pa.array(["t"] * 4, pa.string()),
        "n_chars": pa.array([len(t) for _, t in docs], pa.int64()),
    })
    pq.write_table(table, str(tmp_path / "documents.parquet"))

    rows = {
        r.doc_id: r
        for r in docs_exact_substring_dedup(spark, str(tmp_path)).collect()
    }
    assert rows[0].n_spans == 4 and rows[0].n_dup_spans == 1
    assert rows[1].n_spans == 4 and rows[1].n_dup_spans == 1
    # doc 2: 16 tokens -> 9 spans; the span itself sits at pos 1 and pos 9,
    # both flagged (global count 4: doc0, doc1, and twice here); the 7
    # rotation grams in between occur once each and are NOT flagged
    assert rows[2].n_spans == 9 and rows[2].n_dup_spans == 2
    assert rows[3].n_spans == 0 and rows[3].n_dup_spans == 0
    assert rows[3].dup_frac == 0.0
    assert abs(rows[2].dup_frac - 2.0 / 9.0) < 1e-12


def test_pipeline_yield_full_funnel_monotone(spark):
    from datafusion_tpch_spark.queries.curation import docs_pipeline_yield_full

    rows = docs_pipeline_yield_full(spark, SF_DIR).collect()
    assert [r.stage for r in rows] == [
        "raw", "exact_dedup", "near_dedup", "exact_substr",
        "length_floor", "decontaminated",
    ]
    docs = [r.n_docs for r in rows]
    toks = [r.n_tokens for r in rows]
    assert docs == sorted(docs, reverse=True)
    assert toks == sorted(toks, reverse=True)
    # the added stages actually cut something on the fixture
    assert docs[2] < docs[1], "near-dup stage must drop docs"
    assert docs[-1] > 0 and toks[-1] > 0


def test_capped_membership_degradation_properties(spark):
    """The saturation-fallback contract: under-cap buckets are untouched,
    over-cap buckets keep exactly cap deterministic representatives, and
    the drops generated from the sampled membership are a SUBSET of the
    uncapped drops (recall degrades, never fabricates)."""
    from pyspark.sql import functions as F

    from datafusion_tpch_spark.queries import extensions as ext
    from datafusion_tpch_spark.queries.curation import _capped_lsh_membership

    cap = ext._LSH_MAX_BUCKET
    rows = []
    # bucket A: under cap; bucket B: exactly cap; bucket C: 3x over cap
    for i in range(5):
        rows.append((100 + i, 0, "A"))
    for i in range(cap):
        rows.append((200 + i, 0, "B"))
    for i in range(3 * cap):
        rows.append((300 + i, 1, "C"))
    bk = spark.createDataFrame(rows, "doc_id long, band int, bkey string")

    out1 = _capped_lsh_membership(bk)
    kept = {r.bkey: c for r, c in
            ((row, row.n) for row in
             out1.groupBy("bkey").agg(F.count("*").alias("n")).collect())}
    assert kept == {"A": 5, "B": cap, "C": cap}
    # under-cap and exactly-at-cap buckets keep every member
    a_ids = {r.doc_id for r in out1.filter(F.col("bkey") == "A").collect()}
    assert a_ids == {100 + i for i in range(5)}
    # deterministic: a second evaluation selects the same representatives
    out2 = _capped_lsh_membership(bk)
    assert sorted(map(tuple, out1.collect())) == sorted(map(tuple, out2.collect()))

    def drops(m):
        return {
            r.doc_id
            for r in m.alias("a")
            .join(
                m.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bkey") == F.col("b.bkey"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("b.doc_id").alias("doc_id"))
            .distinct()
            .collect()
        }

    sampled = drops(out1)
    uncapped = drops(bk.select("doc_id", "band", "bkey"))
    assert sampled <= uncapped
    # the over-cap bucket still yields real drops (bounded recall > 0)
    assert any(300 <= d < 300 + 3 * cap for d in sampled)
