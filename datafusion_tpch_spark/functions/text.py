"""Text-analysis column builders (language-ID, quality, tokens, fingerprint).

North-star extension operators for the LLM-data-pipeline workload — all
built from JVM-side ``pyspark.sql.functions`` (no Python UDFs in the hot
path) so they stay inside whole-stage codegen and scale to 100 TB document
tables.  Every builder has a SQL mirror for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = r"\s+"
# BPE-ish word/number/punct splitter used for token *estimation*.
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic, embedded (no model downloads).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("的", "是", "了", "在", "我"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokens (trimmed so no empty leading/trailing tokens)."""
    return F.split(F.trim(col), TOKEN_RE)


def tokens_sql(expr: str) -> str:
    return f"regexp_split_to_array(trim({expr}), '\\s+')"


WORD_RE = r"[^a-z0-9]+"


def words(col: Column) -> Column:
    """Normalized word array: lowercase, split on non-alphanumeric runs,
    empties dropped.  The unit for histogram / TF-IDF style analysis
    (whereas :func:`tokens` preserves punctuation for counting)."""
    return F.filter(F.split(F.lower(col), WORD_RE), lambda x: x != F.lit(""))


def words_sql(expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({expr}), '{WORD_RE}'),"
        f" x -> x <> '')"
    )


def token_count(col: Column) -> Column:
    # cast: Spark size() is int32, the DuckDB oracle's len() is int64
    return F.size(tokens(col)).cast("long")


def token_count_sql(expr: str) -> str:
    return f"len({tokens_sql(expr)})"


def bpe_token_estimate(col: Column) -> Column:
    """BPE-ish token count estimate: word/number/punct pieces, with long
    words counted as ceil(len/4) subword pieces (the classic ~4-chars-per-
    token rule)."""
    words = F.size(F.split(F.trim(col), TOKEN_RE))
    chars = F.length(col)
    return F.greatest(words, F.ceil(chars / F.lit(4.0)).cast("long")).cast("long")


def bpe_token_estimate_sql(expr: str) -> str:
    words = f"len(regexp_split_to_array(trim({expr}), '\\s+'))"
    return f"CAST(greatest({words}, CAST(ceil(length({expr}) / 4.0) AS BIGINT)) AS BIGINT)"


def stopword_hits(col: Column, words: tuple[str, ...]) -> Column:
    """How many tokens of ``col`` are in the stopword list ``words``."""
    toks = tokens(F.lower(col))
    hits = F.filter(toks, lambda t: t.isin(*[F.lit(w) for w in words]))
    return F.size(hits)


def stopword_hits_sql(expr: str, words: tuple[str, ...]) -> str:
    lst = ", ".join("'" + w.replace("'", "''") + "'" for w in words)
    return (
        f"len(list_filter(regexp_split_to_array(trim(lower({expr})), '\\s+'),"
        f" t -> t IN ({lst})))"
    )


def quality_priority(col: Column, scale: int = 10_000) -> Column:
    """Integer quality priority: English stopword density scaled to an
    exact long — ``floor(stop_hits * scale / n_tokens)``.  Both factors
    are exact longs and the integer quotient is never within 1 ulp of a
    double integer boundary at these magnitudes (|a/b - k| >= 1/b), so
    floor(double division) equals integer floor division on BOTH engines.
    The shared ranking key for quality-ordered curation gates."""
    n = token_count(col)
    hits = stopword_hits(col, LANG_STOPWORDS["en"]).cast("long")
    return F.floor(hits * scale / n)


def quality_priority_sql(expr: str, scale: int = 10_000) -> str:
    return (
        f"({stopword_hits_sql(expr, LANG_STOPWORDS['en'])} * {scale})"
        f" // {token_count_sql(expr)}"
    )


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are punctuation/symbols."""
    stripped = F.length(F.regexp_replace(col, r"[^A-Za-z0-9\s]", ""))
    return (F.length(col) - stripped) / F.greatest(F.length(col), F.lit(1))


def punct_ratio_sql(expr: str) -> str:
    stripped = f"length(regexp_replace({expr}, '[^A-Za-z0-9\\s]', '', 'g'))"
    return f"((length({expr}) - {stripped}) * 1.0 / greatest(length({expr}), 1))"


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the lowercase,
    whitespace-normalized text (the exact-dedup key)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def fingerprint_sql(expr: str) -> str:
    return f"md5(regexp_replace(lower(trim({expr})), '\\s+', ' ', 'g'))"


def winnow_fingerprints(col: Column, k: int = 3, w: int = 4) -> Column:
    """Winnowing document fingerprints (rolling-hash selection): hash every
    word k-gram *in order*, then keep the minimum hash of each sliding
    window of ``w`` consecutive k-gram hashes.  The classic local
    fingerprinting scheme (word-granular: two documents sharing a run of
    >= k+w-1 words share a selected fingerprint).  All JVM-side
    higher-order functions; returns sorted array<bigint> of distinct
    selected hashes."""
    from . import hashing

    def let(value, body):
        # let-binding via single-element transform: `value` is evaluated
        # once per row and bound to the lambda variable, so downstream
        # element_at references don't re-evaluate the producing expression
        return F.flatten(F.transform(F.array(value), body))

    def grams_of(t):
        n_grams = F.greatest(F.size(t) - F.lit(k - 1), F.lit(1))
        return F.transform(
            F.sequence(F.lit(1), n_grams),
            # direct indexing, not slice-per-element; concat_ws skips the
            # NULLs element_at yields past the end on short docs, which
            # reproduces "whole doc as one gram" exactly
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, (i + F.lit(j)).cast("int")) for j in range(k)]
            ),
        )

    def wins_of(h):
        n_wins = F.greatest(F.size(h) - F.lit(w - 1), F.lit(1))
        return F.transform(
            F.sequence(F.lit(1), n_wins),
            lambda j: F.least(
                *[F.element_at(h, (j + F.lit(i)).cast("int")) for i in range(w)]
            ),
        )

    wins = let(
        tokens(F.lower(col)),
        lambda t: let(
            F.transform(grams_of(t), lambda g: hashing.md5_int(g)),
            wins_of,
        ),
    )
    return F.array_sort(F.array_distinct(wins))


def winnow_fingerprints_sql(expr: str, k: int = 3, w: int = 4) -> str:
    # direct t[i+j] indexing, not list_slice-per-element: DuckDB evaluates
    # slice lambdas ~50x slower than indexed access at this shape
    from . import hashing

    toks = f"regexp_split_to_array(trim(lower({expr})), '\\s+')"
    gram_concat = " || ' ' || ".join(f"t[i + {j}]" for j in range(k))
    short_gram = f"array_to_string(t, ' ')"
    grams = (
        f"(SELECT CASE WHEN len(t) <= {k - 1} THEN [{short_gram}] "
        f"ELSE list_transform(range(1, len(t) - {k - 1} + 1), i -> {gram_concat}) END "
        f"FROM (SELECT {toks} AS t) _tk)"
    )
    hashes = f"list_transform({grams}, g -> {hashing.md5_int_sql('g')})"
    win_min = "least(" + ", ".join(f"h[j + {j}]" for j in range(w)) + ")"
    wins = (
        f"(SELECT CASE WHEN len(h) <= {w - 1} THEN [list_aggregate(h, 'min')] "
        f"ELSE list_transform(range(1, len(h) - {w - 1} + 1), j -> {win_min}) END "
        f"FROM (SELECT {hashes} AS h) _hs)"
    )
    return f"list_sort(list_distinct({wins}))"


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column, as an array<string>.

    Built with transform over the token array (JVM-side; no UDF): shingle i
    is tokens[i..i+n-1] joined by a space; arrays shorter than n yield the
    whole text as a single shingle.
    """
    # let-bind the token array (single-element transform) and build each
    # shingle with element_at — a slice-per-element lambda re-evaluates the
    # split for every shingle and costs ~3x the whole pipeline
    def build(t: Column) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.size(t) - F.lit(n - 1), F.lit(1)))
        return F.array_distinct(
            F.transform(
                idx,
                # concat_ws skips the NULLs element_at yields past the end,
                # so docs shorter than n become one whole-doc shingle
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, (i + F.lit(j)).cast("int")) for j in range(n)]
                ),
            )
        )

    return F.flatten(F.transform(F.array(tokens(F.lower(col))), build))


def shingles_sql(expr: str, n: int = 3) -> str:
    toks = f"regexp_split_to_array(trim(lower({expr})), '\\s+')"
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({toks}) - {n - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')))"
    )


def positional_kgrams(col: Column, n: int) -> Column:
    """ALL word n-grams of a text column with multiplicity (one element
    per token position — the positional multiset ExactSubstr needs,
    unlike :func:`shingles` which distincts).  Same let-bind idiom
    as shingles (single-element transform) so the token split is
    evaluated once, not once per gram; docs shorter than n yield an
    empty array."""

    def build(t: Column) -> Column:
        idx = F.when(
            F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - F.lit(n - 1))
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(t, (i + F.lit(j)).cast("int")) for j in range(n)],
            ),
        )

    return F.flatten(F.transform(F.array(tokens(F.lower(col))), build))
