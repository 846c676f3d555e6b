"""DSIR importance resampling (datapipe.dsir) — weights verified
against a pure-Python reference fed the SAME hashed buckets (xxhash64
has no Python twin, so bucket arrays are extracted once via Spark and
the Python side recomputes counts, smoothing, quantization, sums, and
the Gumbel-top-k from them), plus selection-shape and determinism
properties."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from logshipper_spark.datapipe import dsir

B = 256  # small bucket space so collisions actually occur in tests


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


RAW_ROWS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "stock market prices fell sharply today"),
    (3, "quarterly earnings beat market estimates"),
    (4, "the cat and the dog played"),
    (5, ""),
    (6, "zebra xylophone quux"),
]
TARGET_ROWS = [
    (100, "the cat sat quietly"),
    (101, "a dog and a cat"),
]


def _py_buckets(spark, df, seed=0):
    """Per-doc hashed feature buckets, extracted via the Spark exprs
    under test (the only engine-trusted piece; everything downstream
    is recomputed in Python)."""
    staged = df.select(
        "doc_id", dsir.tokens(F.lower(F.col("text"))).alias("_toks")
    ).select(
        "doc_id", dsir.feature_buckets(F.col("_toks"), B, seed).alias("b")
    )
    return {r["doc_id"]: list(r["b"]) for r in staged.collect()}


def _py_model(tb, rb, alpha=0.01):
    """Pure-Python Lidstone fit over python-side bucket lists."""
    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    for bl in tb.values():
        for b in bl:
            tc[b] = tc.get(b, 0) + 1
    for bl in rb.values():
        for b in bl:
            rc[b] = rc.get(b, 0) + 1
    denom_t = sum(tc.values()) + alpha * B
    denom_r = sum(rc.values()) + alpha * B
    lr = {
        b: math.floor(
            (
                math.log2((tc.get(b, 0) + alpha) / denom_t)
                - math.log2((rc.get(b, 0) + alpha) / denom_r)
            )
            * dsir.MICRO
            + 0.5
        )
        for b in set(tc) | set(rc)
    }
    oov = math.floor(
        (math.log2(alpha / denom_t) - math.log2(alpha / denom_r)) * dsir.MICRO
        + 0.5
    )
    return lr, oov


def test_weights_match_python_reference(spark):
    raw = _docs(spark, RAW_ROWS)
    target = _docs(spark, TARGET_ROWS)
    model, oov = dsir.fit_dsir(target, raw, num_buckets=B)
    tb = _py_buckets(spark, target)
    rb = _py_buckets(spark, raw)
    lr_py, oov_py = _py_model(tb, rb)
    assert oov == oov_py
    got_model = {
        r["bucket"]: (r["cnt_target"], r["cnt_raw"], r["lr_micro"])
        for r in model.collect()
    }
    assert set(got_model) == set(lr_py)
    for b, (ct, cr, lr) in got_model.items():
        assert lr == lr_py[b], f"bucket {b}"
    w = dsir.dsir_weights(raw, model, oov, num_buckets=B)
    got = {r["doc_id"]: (r["n_feats"], r["logw_micro"]) for r in w.collect()}
    for doc_id, buckets in rb.items():
        exp = sum(lr_py.get(b, oov_py) for b in buckets)
        assert got[doc_id] == (len(buckets), exp), f"doc {doc_id}"
    # never-drop: the empty doc keeps a row at (0, 0)
    assert got[5] == (0, 0)


def test_target_style_docs_outrank_offstyle(spark):
    """Docs sharing the target's ngrams must carry strictly larger
    weights than the finance-style docs (the point of DSIR)."""
    raw = _docs(spark, RAW_ROWS)
    target = _docs(spark, TARGET_ROWS)
    model, oov = dsir.fit_dsir(target, raw, num_buckets=B)
    w = {
        r["doc_id"]: r["logw_micro"]
        for r in dsir.dsir_weights(raw, model, oov, num_buckets=B).collect()
    }
    cat_like = min(w[0], w[4])
    finance = max(w[2], w[3])
    assert cat_like > finance, w


def test_oov_scoring_on_unseen_corpus(spark):
    """Scoring a corpus disjoint from both fit corpora hits the OOV
    coalesce on (nearly) every feature — exact to the constant."""
    raw = _docs(spark, RAW_ROWS[:5])
    target = _docs(spark, TARGET_ROWS)
    model, oov = dsir.fit_dsir(target, raw, num_buckets=B)
    other = _docs(spark, [(900, "wholly disjoint vocabulary here")])
    ob = _py_buckets(spark, other)[900]
    lr_py, oov_py = _py_model(
        _py_buckets(spark, target), _py_buckets(spark, raw)
    )
    exp = sum(lr_py.get(b, oov_py) for b in ob)
    got = dsir.dsir_weights(other, model, oov, num_buckets=B).collect()[0]
    assert (got["n_feats"], got["logw_micro"]) == (len(ob), exp)


def _single_window_topk(rows, k):
    order = sorted(rows, key=lambda r: (-r["key_micro"], r["doc_id"]))
    return {r["doc_id"] for r in order[:k]}


@pytest.mark.parametrize("k", [1, 3, 6])
def test_select_matches_single_window(spark, k):
    raw = _docs(spark, RAW_ROWS)
    target = _docs(spark, TARGET_ROWS)
    model, oov = dsir.fit_dsir(target, raw, num_buckets=B)
    w = dsir.dsir_weights(raw, model, oov, num_buckets=B)
    sel = dsir.dsir_select(w, k, salt_buckets=4)
    rows = [r.asDict() for r in sel.collect()]
    assert len(rows) == len(RAW_ROWS)  # never drops
    chosen = {r["doc_id"] for r in rows if r["selected"] == 1}
    assert len(chosen) == k
    assert chosen == _single_window_topk(rows, k)


def test_select_partition_independent(spark):
    raw = _docs(spark, RAW_ROWS)
    target = _docs(spark, TARGET_ROWS)
    model, oov = dsir.fit_dsir(target, raw, num_buckets=B)
    w = dsir.dsir_weights(raw, model, oov, num_buckets=B)
    a = {
        r["doc_id"]
        for r in dsir.dsir_select(w, 3).collect()
        if r["selected"] == 1
    }
    b = {
        r["doc_id"]
        for r in dsir.dsir_select(w.repartition(7), 3).collect()
        if r["selected"] == 1
    }
    assert a == b and len(a) == 3


def test_select_k_larger_than_corpus(spark):
    raw = _docs(spark, RAW_ROWS)
    target = _docs(spark, TARGET_ROWS)
    model, oov = dsir.fit_dsir(target, raw, num_buckets=B)
    w = dsir.dsir_weights(raw, model, oov, num_buckets=B)
    sel = dsir.dsir_select(w, 100)
    assert sel.filter("selected = 1").count() == len(RAW_ROWS)


def test_select_rejects_bad_k(spark):
    raw = _docs(spark, RAW_ROWS)
    target = _docs(spark, TARGET_ROWS)
    model, oov = dsir.fit_dsir(target, raw, num_buckets=B)
    w = dsir.dsir_weights(raw, model, oov, num_buckets=B)
    with pytest.raises(ValueError):
        dsir.dsir_select(w, 0)


def test_gumbel_bounds_and_determinism(spark):
    """The hash uniform stays inside the open interval, the noise is
    finite, and identical ids get identical noise across frames."""
    ids = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    g = ids.select(
        "doc_id",
        dsir.gumbel_hash(F.col("doc_id"), 7).alias("h"),
        dsir.gumbel_log2_micro(F.col("doc_id"), 7).alias("g"),
    )
    row = g.agg(
        F.min("h"), F.max("h"), F.count(F.when(F.col("g").isNull(), 1))
    ).head()
    assert row[0] >= 0 and row[1] < (1 << 40) and row[2] == 0
    again = {
        r["doc_id"]: r["g"]
        for r in ids.repartition(5)
        .select("doc_id", dsir.gumbel_log2_micro(F.col("doc_id"), 7).alias("g"))
        .collect()
    }
    first = {r["doc_id"]: r["g"] for r in g.select("doc_id", "g").collect()}
    assert first == again
