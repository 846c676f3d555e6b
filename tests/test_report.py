"""Corpus quality report (datapipe.report.corpus_report)."""

from __future__ import annotations

from logshipper_spark.datapipe.report import corpus_report


def test_corpus_report_hand_values(spark):
    base = (
        "The quick brown fox jumps over the lazy dog and runs far away. "
        "It is a fine day for the animals of the forest to play in the sun."
    )
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base + " Extra closing thought for it."),
        (3, "word " * 60 + "mail a@b.co ssn 123-45-6789."),  # repetitive + PII
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    rep = corpus_report(df, near_dup_sample=1.0, near_dup_threshold=0.5)
    assert rep["docs"] == 4
    assert rep["exact_dup_rate"] == 0.25  # 4 docs, 3 distinct
    inc = rep["filter_incidence"]
    assert inc["pii_spans"]["email"] == 1 and inc["pii_spans"]["ssn"] == 1
    assert inc["pii_doc_rate"] == 0.25
    assert inc["repetition_fail_rate"] >= 0.25  # the "word word ..." doc
    # near-dup sample at rate 1.0 must find the planted exact pair
    nd = rep["near_dup_sample"]
    assert nd["sample_docs"] == 4
    assert nd["docs_in_near_dup_pairs"] >= 2
    assert set(rep["lm_band"]) == {"lo", "hi", "in_band_rate"}
    assert len(rep["lm_bits_quantiles_p10_p50_p90"]) == 3
    langs = {r["lang_guess"] for r in rep["per_language"]}
    assert "en" in langs


def test_corpus_report_empty(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert corpus_report(df) == {"docs": 0}


def test_corpus_report_degenerate_all_blank(spark):
    """Every text empty/whitespace/null: all-null aggregates must not
    crash the card (percentile over all-null returns NULL)."""
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, None)], "doc_id long, text string"
    )
    rep = corpus_report(df, near_dup_sample=1.0)
    assert rep["docs"] == 3
    assert rep["lm_bits_quantiles_p10_p50_p90"] is None
    assert rep["lm_band"]["in_band_rate"] == 0.0
    assert rep["filter_incidence"]["pii_spans"]["email"] == 0


def test_corpus_report_all_null_bucket(spark):
    """Every text NULL (not just blank): the per-language bucket's
    quality/token SUMs are SQL NULL — mean_quality must come back None
    and the total sums 0, not a TypeError."""
    df = spark.createDataFrame([(0, None), (1, None)], "doc_id long, text string")
    rep = corpus_report(df, near_dup_sample=1.0)
    assert rep["docs"] == 2 and rep["total_tokens"] == 0
    assert [x["mean_quality"] for x in rep["per_language"]] == [None]


def test_word_ngrams_n1_null_guard(spark):
    """word_ngrams(toks, 1) must keep the null-to-empty-array contract
    the n >= 2 paths get from their when/otherwise guard."""
    from pyspark.sql import functions as F

    from logshipper_spark.datapipe.filters import word_ngrams
    from logshipper_spark.datapipe.textstats import tokens

    df = spark.createDataFrame([(None,), ("a b",)], "text string")
    out = df.select(
        F.size(word_ngrams(tokens(F.lower(F.col("text"))), 1)).alias("n")
    ).collect()
    assert sorted(r["n"] for r in out) == [0, 2]


def test_corpus_report_driver_docs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rep = corpus_report(docs, near_dup_sample=0.3)
    assert rep["docs"] == 500
    assert rep["exact_dup_rate"] == 0.0
    assert rep["total_tokens"] > 0
    assert rep["token_quantiles_p50_p90_p99"][0] > 0


def test_corpus_report_substr_section(spark):
    # two docs sharing a long passage + one unrelated: the sampled
    # substring section (rate 1.0) must see both sharers
    shared = "the quick brown fox jumps over the lazy dog again and again forever"
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma " + shared + " delta epsilon"),
            (2, "one two three four " + shared + " five six"),
            (3, "totally unrelated content with no overlap at all whatsoever here"),
        ],
        ["doc_id", "text"],
    )
    rep = corpus_report(
        df,
        near_dup_sample=0.0,
        substr_sample=1.0,
        substr_w=4,
        substr_window=3,
    )
    ss = rep["substr_sample"]
    assert ss["sample_docs"] == 3
    assert ss["docs_with_shared_spans"] == 2
    assert abs(ss["shared_span_doc_rate_in_sample"] - 2 / 3) < 1e-6
    # the 13-token run is most of each ~19-token doc
    assert 0.3 < ss["mean_shared_fraction_in_affected"] <= 1.0
    # section off when substr_sample=0
    rep2 = corpus_report(df, near_dup_sample=0.0, substr_sample=0.0)
    assert "substr_sample" not in rep2


def test_snapshot_diff(spark):
    """CDC classification: added/removed/changed/unchanged with
    null-safe text equality and signed token deltas."""
    from pyspark.sql import functions as F  # noqa: F401

    from logshipper_spark.datapipe import report

    prev = spark.createDataFrame(
        [(0, "a b c"), (1, "x y"), (2, None), (3, "gone now")],
        "doc_id long, text string",
    )
    cur = spark.createDataFrame(
        [(0, "a b c"), (1, "x y z"), (2, None), (4, "brand new doc")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["status"], r["tok_delta"])
        for r in report.snapshot_diff(prev, cur).collect()
    }
    assert got == {
        0: ("unchanged", 0),
        1: ("changed", 1),
        2: ("unchanged", 0),   # NULL == NULL null-safely
        3: ("removed", -2),
        4: ("added", 3),
    }
