"""End-to-end test of jobs/run_transcript_dataprep.py — the capstone
transcripts→training-data entrypoint. Runs the job as a user would
(fresh subprocess, both output modes against one shared input) and
checks the cross-stage invariants that individual operator tests
can't see: stage row accounting, exactly-full packed chunks, split
disjointness, and shard/byte conservation."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "jobs", "run_transcript_dataprep.py")


@pytest.fixture(scope="module")
def turns_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tdp") / "turns")
    from logshipper_spark import gen

    gen.transcripts(spark, 6000).write.mode("overwrite").parquet(d)
    return d


def _run(turns_dir, out, *extra):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [sys.executable, JOB, "--turns", turns_dir, "--out", out,
         "--require-ok", "--split", "train:0.8,val:0.2", *extra],
        env=env, capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    with open(os.path.join(out, "summary.json")) as f:
        return json.load(f)


def test_dataprep_budget_mode(spark, turns_dir, tmp_path):
    out = str(tmp_path / "out")
    s = _run(turns_dir, out, "--sft", "--sft-pack", "--budget", "128",
             "--vocab-size", "1000", "--min-count", "1")
    # stage accounting: every conversation renders to one doc; splits
    # partition the kept docs
    assert s["rendered_docs"] == s["conversations_ok"] > 0
    assert sum(s["split_counts"].values()) == s["kept_docs"]
    assert s["sft_pairs"] > 0 and s["wall_s"] > 0
    # chunk invariants: every non-final chunk per split exactly full,
    # ids dense from 0, token totals conserved from the id streams
    ch = spark.read.parquet(os.path.join(out, "chunks"))
    mx = ch.groupBy("split").agg(
        F.max("chunk_id").alias("mx"), F.count("*").alias("n")
    )
    bad = ch.join(mx, "split").filter(
        (F.col("chunk_id") != F.col("mx")) & (F.col("n_tokens") != 128)
    )
    assert bad.count() == 0
    assert mx.filter(F.col("n") != F.col("mx") + 1).count() == 0
    toks = spark.read.parquet(os.path.join(out, "tokens"))
    assert (
        ch.agg(F.sum("n_tokens")).head()[0]
        == toks.agg(F.sum(F.size("ids"))).head()[0]
        == s["stream_tokens"]
    )
    # split disjointness by construction of the hash threshold: one
    # split per doc
    sv = spark.read.parquet(os.path.join(out, "survivors"))
    assert sv.groupBy("doc_id").count().filter("count > 1").count() == 0
    # loss-masked SFT chunks: mask aligned, non-final chunks full, and
    # token/loss totals conserved from the committed pairs (loss = every
    # response token + EOS; stream = both lanes + BOS + EOS per pair)
    from logshipper_spark.datapipe import textstats

    sfc = spark.read.parquet(os.path.join(out, "sft_chunks"))
    assert sfc.filter(F.size("input_ids") != F.size("loss_mask")).count() == 0
    mx2 = sfc.groupBy("split").agg(F.max("chunk_id").alias("mx"))
    assert sfc.join(mx2, "split").filter(
        (F.col("chunk_id") != F.col("mx")) & (F.col("n_tokens") != 128)
    ).count() == 0
    pairs = spark.read.parquet(os.path.join(out, "sft"))
    lanes = pairs.select(
        F.size(textstats.tokens(F.lower(F.col("prompt")))).alias("p"),
        F.size(textstats.tokens(F.lower(F.col("response")))).alias("r"),
    ).agg(F.sum("p").alias("p"), F.sum("r").alias("r"),
          F.count(F.lit(1)).alias("n")).head()
    got = sfc.agg(F.sum("n_tokens"), F.sum("n_loss_tokens")).head()
    assert got[0] == lanes["p"] + lanes["r"] + 2 * lanes["n"]
    assert got[1] == lanes["r"] + lanes["n"]
    assert s["sft_chunks"]["train"]["n_chunks"] > 0


def test_dataprep_shard_mode(spark, turns_dir, tmp_path):
    out = str(tmp_path / "out")
    s = _run(turns_dir, out, "--shard-bytes", "30000", "--scrub-pii")
    corpus = spark.read.parquet(os.path.join(out, "corpus"))
    assert corpus.count() == s["kept_docs"]
    # a rewrite stage (--scrub-pii) must leave out/prepared's length
    # metadata describing its OWN text column (ADVICE r3)
    prepared = spark.read.parquet(os.path.join(out, "prepared"))
    assert prepared.filter(
        F.col("n_chars") != F.length("text")
    ).count() == 0
    # byte conservation: shard plan bytes == prepared (post-scrub)
    # text bytes — the scrub stage REWRITES text, so the raw render is
    # no longer the corpus's byte source
    assert (
        corpus.agg(F.sum(F.octet_length("text"))).head()[0]
        == spark.read.parquet(os.path.join(out, "prepared"))
        .agg(F.sum(F.octet_length("text"))).head()[0]
    )
    # every non-final shard per split reaches the target (its last doc
    # crosses the boundary): max cum_bytes in shard k >= 30000*(k+1)
    # for k < max shard — check via per-shard byte sums monotonicity
    per = corpus.groupBy("split", "shard").agg(
        F.sum(F.octet_length("text")).alias("b")
    )
    mx = per.groupBy("split").agg(F.max("shard").alias("mx"))
    # shards are target +/- one doc; with ~5KB docs and 30KB target a
    # non-final shard holds >= 30000 - maxdoc bytes
    maxdoc = corpus.agg(F.max(F.octet_length("text"))).head()[0]
    low = per.join(mx, "split").filter(
        (F.col("shard") != F.col("mx")) & (F.col("b") < 30000 - maxdoc)
    )
    assert low.count() == 0
