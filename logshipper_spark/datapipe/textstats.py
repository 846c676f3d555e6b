"""Text analysis over document tables: token counting, quality scoring,
language ID, fingerprinting. All native column expressions (regexp_count,
higher-order array functions) — no Python in the hot path."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword-hit heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "que", "por"],
}
_BPE_ISH_RE = r"[A-Za-z]+|\d|[^A-Za-z\d\s]"
_PUNCT_RE = r"[.!?,;:]"


def tokens(text: Column) -> Column:
    """Whitespace tokens; empty input → empty array."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored token estimate: alpha runs + single digits + single
    punctuation marks, counted with a JVM-side regexp_count."""
    return F.regexp_count(text, F.lit(_BPE_ISH_RE))


def stopword_hits(text: Column, lang: str) -> Column:
    """Number of tokens (with repeats) found in the language's stopword
    list — higher-order filter, no UDF."""
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(F.lower(text)), lambda t: F.array_contains(stop, t)))


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: length band + punctuation ratio band +
    English stopword ratio band (the classic Gopher-style cheap filters)."""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    punct = F.regexp_count(text, F.lit(_PUNCT_RE))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stopword_hits(text, "en") / n_tokens).otherwise(
        F.lit(0.0)
    )
    length_ok = ((n_chars >= 50) & (n_chars <= 20_000)).cast("double")
    punct_ok = (punct_ratio <= 0.2).cast("double")
    stop_ok = (stop_ratio >= 0.01).cast("double")
    return F.round((length_ok + punct_ok + stop_ok) / 3.0, 4)


def lang_id(text: Column) -> Column:
    """Stopword-hit language ID: argmax of per-language hit counts via an
    array-of-structs max (deterministic tie-break on language code);
    'unknown' when nothing hits."""
    scored = F.array(
        *[
            F.struct(
                stopword_hits(text, lang).alias("hits"), F.lit(lang).alias("lang")
            )
            for lang in sorted(STOPWORDS)
        ]
    )
    best = F.array_max(scored)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("unknown"))


def fingerprint(text: Column) -> Column:
    """Order-sensitive document fingerprint: rolling hash over normalized
    tokens, folded with F.aggregate as a hash chain
    (acc' = xxhash64(acc, token)) — wrap-around-safe under ANSI mode,
    distributed, no UDF."""
    toks = tokens(F.lower(text))
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.xxhash64(acc, t),
    )


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass projection with all text statistics."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_guess"),
        fingerprint(t).alias("fp"),
    )


def corpus_stats(
    df: DataFrame, text_col: str = "text", approx_distinct: float | None = None
) -> DataFrame:
    """Corpus accounting rollup by detected language — the numbers a
    training-data pipeline reports per ingest batch: document and
    distinct-document counts (exact, via the 128-bit content key — the
    contract oracle counts DISTINCT text directly, an independent ground
    truth), token/byte totals, and the summed 4-dp quality (kept as an
    exact integer sum — ``quality_sum_4dp / 10000 / docs`` is the mean —
    so the aggregate is order-independent and bit-reproducible; a double
    AVG would be neither).

    Scale: the stats projection is narrow; the groupBy is map-side
    combined. Exact COUNT(DISTINCT) adds a partial-distinct expand (two
    shuffles total); ``approx_distinct=rsd`` (e.g. 0.01) swaps in an
    HLL++ sketch over the 64-bit content hash — single shuffle, fixed
    sketch bytes per (lang, partition) — for the 100 TB report where a
    ±1% distinct estimate suffices. The contract oracle pins the exact
    path; the approx path is bounds-tested in unit tests."""
    t = F.col(text_col)
    st = text_stats(df, text_col)
    q4 = F.floor(F.col("quality") * 10000 + F.lit(0.5)).cast("long")
    if approx_distinct is not None:
        distinct = F.approx_count_distinct(
            F.xxhash64(t, F.lit(0)), rsd=approx_distinct
        )
    else:
        distinct = F.count_distinct(
            F.struct(F.xxhash64(t, F.lit(0)), F.xxhash64(t, F.lit(1)))
        )
    return st.groupBy("lang_guess").agg(
        F.count("*").alias("docs"),
        distinct.alias("distinct_texts"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_bpe_tokens").cast("long").alias("total_bpe_tokens"),
        F.sum(F.length(t)).cast("long").alias("total_chars"),
        F.sum(q4).alias("quality_sum_4dp"),
    )
