"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline is the north-rule metric — end-to-end routed turns/sec
through parse → enrich → route → aggregate on the synthetic transcript
table (turn count scaled by sf). `--scaling` re-runs the pipeline in
fresh subprocesses at N and 4N cores on the SAME input and reports
throughput at both plus scaling efficiency (the sandbox stand-in for
the N → 4N executor criterion; see BASELINE.md).

Noise discipline (this VM has noisy neighbors arriving in multi-second
bursts — BASELINE.md round-2 notes) lives INSIDE the harness so the
driver's capture is trustworthy, not just quiet-window reruns:

* every query is timed best-of-N (default 5; `SPARK_GRAFT_QUERY_RUNS`)
  after a warmup evaluation of the same plan (Janino + JIT excluded);
  the JSON reports the best per query (`queries`) AND the full spread
  (`query_runs`);
* the materialized-batch measurement takes best-of-N batches (default
  3; `SPARK_GRAFT_BATCH_RUNS`) after the warmup batch;
* `--scaling` interleaves the parallelism legs ABAB (N, 4N, N, 4N —
  never AA-then-BB, so a noise burst cannot land entirely on one
  level), each leg a fresh JVM doing best-of-4 timed runs; efficiency
  pairs each level's best across its legs.

Forced evaluation uses the `noop` datasource — full computation of
every output column, no sink IO in the measurement.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from logshipper_spark import aggregate as agg  # noqa: E402
from logshipper_spark import anomaly, gen, parse, pipeline, route  # noqa: E402
from logshipper_spark import temporal, transcript  # noqa: E402
from logshipper_spark.datapipe import dedup, similarity  # noqa: E402
from logshipper_spark.session import get_spark  # noqa: E402

TURNS_PER_SF = 6_000_000  # sf0.1 → 600k turns


def _sf_of(sf_dir: str) -> float:
    tail = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(tail.replace("sf", ""))
    except ValueError:
        return 0.1


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


_RUN_LOG: dict[str, list[float]] = {}


def _timed(fn, name: str | None = None, warmup: bool = True) -> float:
    """Best-of-N timing with a warmup evaluation: the first (untimed)
    run pays Janino compilation and JIT; N timed runs follow and the
    minimum is reported (peak sustained throughput — the comparable
    number on a noisy-neighbor VM). All runs land in _RUN_LOG."""
    n = int(os.environ.get("SPARK_GRAFT_QUERY_RUNS", "5"))
    if warmup:
        for _ in range(int(os.environ.get("SPARK_GRAFT_BENCH_WARMUPS", "1"))):
            fn()
    runs = []
    for _ in range(n):
        t0 = time.time()
        fn()
        runs.append(round(time.time() - t0, 3))
    if name:
        _RUN_LOG[name] = runs
    return min(runs)


def run_bench(sf_dir: str, pipeline_only: bool = False) -> dict:
    sf = _sf_of(sf_dir)
    n_turns = int(
        os.environ.get("SPARK_GRAFT_BENCH_TURNS", max(10_000, int(TURNS_PER_SF * sf)))
    )
    # shuffle partitions are work-targeted by the bench's input size
    # (session.work_targeted_partitions): ~100k turns/task clamped to
    # [1x, 3x] cores — 600k/32c -> 32, scaling legs 9.6M/16c -> 48.
    # A fixed 3/core regressed the 600k chain 20-30% (interleaved A/B;
    # AQE coalesces shuffles but tiny map tasks still pay scheduling).
    from logshipper_spark.session import work_targeted_partitions

    spark = get_spark(
        app_name="logshipper-bench",
        shuffle_partitions=work_targeted_partitions(n_turns),
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    times: dict[str, float] = {}

    # headline: parse → enrich → stable ordering, full column evaluation
    tr = gen.transcripts(spark, n_turns).cache()
    tr.count()  # materialize the input so the measurement excludes generation
    enriched = pipeline.normalize_and_enrich(spark, tr)
    # warmup pass(es): Janino compile + HotSpot JIT tiering, not
    # measured. Fresh high-parallelism JVMs ramp for ~2 evaluations
    # (measured in the round-3 scaling runs: first timed 16-core run
    # 57-59 s vs 25-29 s steady state), so the scaling harness sets
    # SPARK_GRAFT_BENCH_WARMUPS=2 on 4N-core legs.
    for _ in range(int(os.environ.get("SPARK_GRAFT_BENCH_WARMUPS", "1"))):
        _force(enriched)
    # best-of-N: the sandbox VM has noisy neighbors; peak sustained
    # throughput is the stable, comparable number
    runs = []
    for _ in range(int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))):
        t0 = time.time()
        _force(enriched)
        runs.append(round(time.time() - t0, 3))
    times["pipeline_parse_enrich"] = min(runs)
    _RUN_LOG["pipeline_parse_enrich"] = runs
    turns_per_sec = round(n_turns / times["pipeline_parse_enrich"], 1)

    enriched = enriched.cache()
    enriched.count()
    times["route_sink_counts"] = _timed(
        lambda: _force(
            route.sink_counts(
                route.routed_rows(enriched, gen.routing_rules()), ts_col="ts"
            )
        ),
        "route_sink_counts",
    )
    times["edge_agg"] = _timed(
        lambda: _force(
            agg.edge_agg(
                enriched, ts_col="event_ts", order_cols=["ts", "conv_id", "turn_idx"]
            )
        ),
        "edge_agg",
    )
    result: dict = {
        "metric": "end_to_end_routed_turns_per_sec",
        "value": turns_per_sec,
        "unit": "sec",
        "sf": sf,
        "n_turns": n_turns,
        "cores": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "pipeline_runs": runs,
        "queries": times,
    }
    if pipeline_only:
        enriched.unpersist()
        tr.unpersist()
        return result

    # full materialized batch: parse → enrich → route (all sink writes)
    # → windowed counts → edge agg → lineage commit; the most end-to-end
    # number (includes real sink IO, unlike the noop-forced headline)
    import shutil
    import tempfile

    # warmup batch: Janino-compiles the write path so the measured run
    # reflects steady-state throughput, not one-time codegen
    warm_dir = tempfile.mkdtemp(prefix="bench_warm_")
    try:
        pipeline.run_batch(
            spark, gen.transcripts(spark, 50_000), warm_dir, run_id="warm", batch_id=0
        )
    finally:
        shutil.rmtree(warm_dir, ignore_errors=True)

    batch_tps = {}
    for mode in ("single_pass", "per_sink"):
        # the headline mode takes best-of-N full batches (real sink IO
        # is where noise bursts hit hardest); per_sink is informational
        n_batches = (
            int(os.environ.get("SPARK_GRAFT_BATCH_RUNS", "3"))
            if mode == "single_pass"
            else 1
        )
        mode_runs = []
        for i in range(n_batches):
            out_dir = tempfile.mkdtemp(prefix="bench_batch_")
            try:
                summary = pipeline.run_batch(
                    spark, tr, out_dir, run_id=f"bench{i}", batch_id=0,
                    sink_write_mode=mode,
                )
                mode_runs.append(
                    (round(summary["elapsed_sec"], 3),
                     round(summary["turns_per_sec"], 1))
                )
            finally:
                shutil.rmtree(out_dir, ignore_errors=True)
        best = min(mode_runs)
        times[f"full_batch_{mode}"] = best[0]
        _RUN_LOG[f"full_batch_{mode}"] = [r[0] for r in mode_runs]
        batch_tps[mode] = best[1]
    result_batch_tps = batch_tps["single_pass"]

    times["anomaly_zscore"] = _timed(
        lambda: _force(
            anomaly.rolling_zscore(
                enriched.filter("src_service <> '' AND dst_service <> ''").selectExpr(
                    "src_service || '|' || dst_service AS edge_key",
                    "ts", "conv_id", "turn_idx", "latency_us / 1000.0 AS value",
                ),
                key_cols=["edge_key"], value_col="value",
                order_cols=["ts", "conv_id", "turn_idx"],
            )
        ),
        "anomaly_zscore",
    )
    # conversation-level transcript analytics (transcript.py, L49–L53)
    # over the cached raw turns — per-conv-bounded windows/groupBys
    times["conv_stats"] = _timed(
        lambda: _force(transcript.conv_stats(tr)), "conv_stats"
    )
    times["tool_transitions"] = _timed(
        lambda: _force(transcript.step_transitions(tr)), "tool_transitions"
    )
    times["transcript_render"] = _timed(
        lambda: _force(transcript.render_conversations(tr)), "transcript_render"
    )
    times["sft_pairs"] = _timed(
        lambda: _force(transcript.sft_pairs(tr)), "sft_pairs"
    )
    times["conv_integrity"] = _timed(
        lambda: _force(transcript.integrity_report(tr)), "conv_integrity"
    )

    # temporal joins (temporal.py, L54-L55) over the cached turns. The
    # role key is deliberately HOT (3-way cardinality), so the as-of
    # measurement exercises the blocked two-phase form's bounded-task
    # claim; the range join runs the bucketed large-x-large path.
    deploys = tr.filter(
        (F.crc32(F.col("conv_id")) % 37 == 0) & (F.col("turn_idx") == 0)
    ).select(
        F.col("role").alias("key"), "ts",
        (F.crc32(F.col("conv_id")) % 100000).alias("ver"),
    )
    probe = tr.select("conv_id", "turn_idx", F.col("role").alias("key"), "ts")
    times["asof_join"] = _timed(
        lambda: _force(
            temporal.asof_join_blocked(
                probe, deploys, ["key"], payloads=["ver"],
                tiebreak="ver", block_s=3600,
            )
        ),
        "asof_join",
    )
    incidents = tr.filter(
        (F.crc32(F.col("conv_id")) % 97 == 0) & (F.col("turn_idx") == 0)
    ).select(
        F.col("conv_id").alias("iid"), F.col("role").alias("key"),
        F.col("ts").alias("start_ts"),
        F.expr("ts + make_dt_interval(0, 2, 0, 0)").alias("end_ts"),
    )
    times["range_join"] = _timed(
        lambda: _force(
            temporal.range_join(
                probe, incidents, ["key"],
                method="bucketed", bucket_width_s=1800,
            )
        ),
        "range_join",
    )

    # unique-per-key dense order id (the operator's contract): conv_id
    # is gen.py's 'conv-%08d' and turn_idx < 1024, so conv_no*1024 +
    # turn_idx is globally unique — no hash-bucket birthday collisions
    zb_in = enriched.filter(
        "src_service <> '' AND dst_service <> ''"
    ).selectExpr(
        "src_service || '|' || dst_service AS edge_key",
        "try_cast(substring(conv_id, 6) AS long) * 1024 + turn_idx"
        " AS event_id",
        "latency_us AS value",
    )

    def _cold_zscore_blocked() -> None:
        anomaly.release_cached_rollups()  # COLD prefix frame each run
        _force(
            anomaly.rolling_zscore_blocked(
                zb_in, key_cols=["edge_key"], value_col="value",
                order_col="event_id", block_size=1 << 22,
            )
        )

    times["zscore_blocked"] = _timed(_cold_zscore_blocked, "zscore_blocked")
    anomaly.release_cached_rollups()
    enriched.unpersist()
    tr.unpersist()

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    lat = "CAST(floor(value * 100) AS LONG)"
    jtext = F.expr(
        "concat('{\"timestamp\":\"', date_format(ts, \"yyyy-MM-dd'T'HH:mm:ss.SSS'Z'\"),"
        " '\",\"level\":\"info\",\"service\":\"svc-', CAST(user_id % 8 AS STRING),"
        f" '\",\"latency\":\"', {lat}, 'ms\",\"status_code\":200,"
        "\"operation\":\"do_', event_type, '\"}')"
    )
    times["parse_json_events"] = _timed(
        lambda: _force(
            parse.parse_normalized(
                ev.withColumn("text", jtext), text_col="text", source_name="bench"
            )
        ),
        "parse_json_events",
    )
    # per-format micro-parity with the reference's ns/op table
    # (docs/benchmark-results.md:21-23: JSON 2867, ECS 2879, plain 429 ns/op)
    ecs_text = F.expr(
        "concat('{\"@timestamp\":\"', date_format(ts, \"yyyy-MM-dd'T'HH:mm:ss.SSS'Z'\"),"
        " '\",\"log\":{\"level\":\"info\"},\"service\":{\"name\":\"svc-',"
        " CAST(user_id % 8 AS STRING),"
        f" '\"}},\"event\":{{\"duration\":', {lat} * 1000000, '}},"
        "\"message\":\"ecs\"}')"
    )
    times["parse_ecs_events"] = _timed(
        lambda: _force(
            parse.parse_normalized(
                ev.withColumn("text", ecs_text), text_col="text", source_name="bench"
            )
        ),
        "parse_ecs_events",
    )
    plain_text = F.expr(
        "concat('worker handled request #', CAST(event_id AS STRING), ' ok')"
    )
    times["parse_plain_events"] = _timed(
        lambda: _force(
            parse.parse_normalized(
                ev.withColumn("text", plain_text), text_col="text", source_name="bench"
            )
        ),
        "parse_plain_events",
    )

    # round-4 operators
    from logshipper_spark import graphalg as graphalg_mod
    from logshipper_spark import template as template_mod

    # single-shot like the index-build rows (an iterative job's
    # localCheckpoint blocks release only via GC — six repetitions add
    # heap pressure, not information). Input = the generator's weighted
    # topology itself (the edge list pagerank consumes IS topology-
    # sized — graphalg.adjacency_from_edges discipline); collecting a
    # fresh aggregate off the live parse chain at this point in the
    # bench tipped the driver heap, and the per-iteration machinery
    # being measured is identical either way.
    pr_rows = [
        (e[0], e[1], 1000 + 97 * i) for i, e in enumerate(gen._WEIGHTED)
    ]
    pr_edges = spark.createDataFrame(pr_rows, "src string, dst string, w long")
    t0 = time.time()
    _force(graphalg_mod.pagerank(pr_edges, iterations=10, weight_col="w"))
    times["pagerank_10iter"] = round(time.time() - t0, 3)
    log_msgs = enriched.selectExpr(
        "concat(src_service, ' -> ', dst_service, ' op ', operation,"
        " ' took ', CAST(latency_us AS STRING), 'us status ',"
        " CAST(status_code AS STRING)) AS message"
    )
    times["template_induction"] = _timed(
        lambda: _force(template_mod.induce_templates(log_msgs, k=50)),
        "template_induction",
    )
    times["burst_flags"] = _timed(
        lambda: _force(
            agg.burst_flags(
                tr, ts_col="ts", key_cols=["role"], bucket_s=60
            )
        ),
        "burst_flags",
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # round-4 document operators
    from logshipper_spark.datapipe import textstats as textstats_mod

    fz_titles = docs.selectExpr("doc_id", "substr(text, 1, 24) AS text")
    times["fuzzy_dedup_pairs"] = _timed(
        lambda: _force(dedup.fuzzy_dup_pairs(fz_titles, max_edit=2)),
        "fuzzy_dedup_pairs",
    )
    def _pmi_run():
        _force(textstats_mod.pmi_pairs(docs, window=4, min_pair_count=3, k=50))
        textstats_mod.release_cached_postings()  # in-op pair/uni caches

    times["pmi_pairs"] = _timed(_pmi_run, "pmi_pairs")
    times["containment_pairs"] = _timed(
        lambda: _force(
            dedup.containment_pairs(docs, k=3, threshold=0.5)
        ),
        "containment_pairs",
    )


    # minhash/curate cache signatures internally: rebuild the plan COLD
    # each timed run (clearCache + release) so best-of-N measures the
    # full operator, not a warm signature cache
    def _cold_minhash() -> None:
        spark.catalog.clearCache()
        dedup.release_cached_signatures()
        _force(dedup.minhash_lsh_pairs(docs, threshold=0.5))

    times["minhash_lsh"] = _timed(_cold_minhash, "minhash_lsh")
    times["simhash_pairs"] = _timed(
        lambda: _force(dedup.simhash_pairs(docs, max_hamming=3)),
        "simhash_pairs",
    )
    from logshipper_spark.datapipe import substr as substr_mod

    def _cold_substr() -> None:
        substr_mod.release_cached_fingerprints()
        _force(substr_mod.substr_dup_pairs(docs, w=8, window=4, min_shared=2))

    times["substr_pairs"] = _timed(_cold_substr, "substr_pairs")
    from logshipper_spark.datapipe import curate as curate_mod

    def _cold_curate() -> None:
        spark.catalog.clearCache()
        dedup.release_cached_signatures()
        _force(curate_mod.curate(docs, min_quality=0.3, near_dup=True))

    times["curate"] = _timed(_cold_curate, "curate")
    from logshipper_spark.datapipe import filters as filters_mod

    times["repetition_pii"] = _timed(
        lambda: _force(filters_mod.pii_scrub(filters_mod.repetition_stats(docs))),
        "repetition_pii",
    )
    # HTML-wrapped docs so the WARC→WET extraction pass measures its
    # real shape: block removal + tag strip + entity decode + the
    # anchor-chars fold, all one map-only projection
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><script>var x=1;</script>"
                  "<style>p { x: 1 }</style></head><body><p>"),
            F.col("text"),
            F.lit('</p><a href="/n">next page</a><!-- f --></body></html>'),
        ).alias("text"),
    )
    times["html_extract"] = _timed(
        lambda: _force(filters_mod.html_extract(wrapped)), "html_extract"
    )
    # multi-line docs (per-source boilerplate footer) so the cross-doc
    # line-dedup pass measures its real shape: explode → df-count →
    # anti-mark join → positional rebuild
    multi_line = docs.selectExpr(
        "doc_id",
        "concat(text, '.', '\n', '(c) ', upper(source),"
        " ' all rights reserved.', '\n', 'ok') AS text",
    )
    times["line_dedup"] = _timed(
        lambda: _force(dedup.line_dedup(multi_line)),
        "line_dedup",
    )
    from logshipper_spark.datapipe import decontam as decontam_mod
    from logshipper_spark.datapipe import packing as packing_mod

    times["pack_chunks"] = _timed(
        lambda: _force(packing_mod.pack_chunks(docs, budget=2048)),
        "pack_chunks",
    )
    times["decontaminate"] = _timed(
        lambda: _force(
            decontam_mod.decontaminate(
                docs, docs.filter("doc_id % 97 = 0"), n=5
            )
        ),
        "decontaminate",
    )
    from logshipper_spark.datapipe import lm as lm_mod

    def _lm_fit_score() -> None:
        lm_mod.release_cached_counts()  # keep each run a COLD fit
        model, oov = lm_mod.fit_unigram_lm(docs)
        _force(lm_mod.lm_score(docs, model, oov))

    times["lm_fit_score"] = _timed(_lm_fit_score, "lm_fit_score")
    lm_mod.release_cached_counts()

    def _lm_bigram_fit_score() -> None:
        lm_mod.release_cached_counts()  # COLD fit each run
        bi, tok, uo, fo = lm_mod.fit_bigram_lm(docs)
        _force(lm_mod.lm_score_bigram(docs, bi, tok, uo, fo))

    times["lm_bigram_fit_score"] = _timed(
        _lm_bigram_fit_score, "lm_bigram_fit_score"
    )
    lm_mod.release_cached_counts()
    from logshipper_spark.datapipe import dsir as dsir_mod

    def _dsir_fit_select() -> None:
        target = docs.filter("source IN ('src0', 'src1')")
        model, oov = dsir_mod.fit_dsir(target, docs)
        w = dsir_mod.dsir_weights(docs, model, oov)
        _force(dsir_mod.dsir_select(w, 1000))
        dsir_mod.release_cached_models()

    times["dsir_fit_select"] = _timed(_dsir_fit_select, "dsir_fit_select")
    from logshipper_spark.datapipe import bpe as bpe_mod
    from logshipper_spark.datapipe import tokenize as tokenize_mod

    def _tokenize_ids() -> None:
        vocab = tokenize_mod.vocab_build(docs, max_size=50_000, min_count=2)
        _force(tokenize_mod.tokenize_ids(docs, vocab))

    times["tokenize_ids"] = _timed(_tokenize_ids, "tokenize_ids")
    # loss-masked SFT packing: vocab MATERIALIZED (persist + count)
    # outside the timing — a lazy vocab frame would re-run the full
    # corpus fit inside both lanes' broadcast on every evaluation — so
    # the row measures examples (two lane tokenizations + pair join) +
    # the zipped pack/assemble, the text→training-tensors step itself
    _sft_vocab = tokenize_mod.vocab_build(
        docs, max_size=50_000, min_count=2
    ).persist()
    _sft_vocab.count()
    _sft_pairs = docs.selectExpr(
        "doc_id AS pair_id", "text AS prompt", "text AS response"
    )
    times["sft_mask_pack"] = _timed(
        lambda: _force(
            packing_mod.pack_masked(
                packing_mod.sft_examples(_sft_pairs, _sft_vocab), budget=2048
            )
        ),
        "sft_mask_pack",
    )
    _sft_vocab.unpersist()
    # bpe_train is a driver-paced merge loop (one vocab-sized job per
    # merge) — time a fixed 8-merge train once, then the corpus-wide
    # segmentation with the trained dictionary
    t0 = time.time()
    _bpe_merges, bpe_pieces = bpe_mod.bpe_train(docs, num_merges=8)
    times["bpe_train_8"] = round(time.time() - t0, 3)
    times["bpe_segment"] = _timed(
        lambda: _force(bpe_mod.bpe_segment(docs, bpe_pieces)), "bpe_segment"
    )
    times["shard_plan"] = _timed(
        lambda: _force(packing_mod.shard_plan(docs, target_bytes=1 << 20)),
        "shard_plan",
    )
    from logshipper_spark.datapipe import sampling as sampling_mod
    from logshipper_spark.datapipe import textstats as textstats_mod

    scored = docs.select(
        "source",
        "doc_id",
        textstats_mod.token_count(F.col("text")).cast("long").alias("n_tok"),
    )
    times["quantile_bins"] = _timed(
        lambda: _force(
            sampling_mod.quantile_bins(
                scored, k=10, score_col="n_tok", group_col="source"
            )
        ),
        "quantile_bins",
    )
    sentenceified = docs.select(
        "doc_id",
        F.regexp_replace(
            "text", r"([a-z]+ [a-z]+ [a-z]+) ", r"$1. "
        ).alias("text"),
    )
    times["sentence_chunks"] = _timed(
        lambda: _force(
            packing_mod.sentence_chunks(
                sentenceified, max_sentences=4, stride=2
            )
        ),
        "sentence_chunks",
    )
    from logshipper_spark.datapipe import multimodal as multimodal_mod

    media = multimodal_mod.gen_real_media(spark, 4000).persist()
    media.count()  # encode once; the row times DECODE throughput
    times["media_decode"] = _timed(
        lambda: _force(multimodal_mod.decode_media_features(media)),
        "media_decode",
    )
    media.unpersist()
    bm25_queries = textstats_mod.prefix_queries(docs, mod=37, rem=3, n_tokens=5)

    def _cold_bm25() -> None:
        textstats_mod.release_cached_postings()  # COLD postings each run
        _force(
            textstats_mod.bm25_topk(docs, bm25_queries, k=10, max_df_frac=0.9)
        )

    times["bm25_topk"] = _timed(_cold_bm25, "bm25_topk")
    textstats_mod.release_cached_postings()
    url_docs = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://sub"),
            (F.col("doc_id") % 97).cast("string"),
            F.lit(".host"),
            (F.col("doc_id") % 13).cast("string"),
            F.lit(".ex"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".com/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    url_blocked = spark.createDataFrame(
        [(f"ex{i}.com",) for i in range(3)], "domain string"
    )
    times["url_filter"] = _timed(
        lambda: _force(filters_mod.url_filter(url_docs, url_blocked)),
        "url_filter",
    )
    mh_dir = tempfile.mkdtemp(prefix="bench_mh_")
    try:
        t0 = time.time()
        dedup.write_minhash_index(
            docs.filter("doc_id % 5 = 0"), mh_dir, mode="overwrite"
        )
        times["minhash_index_build"] = round(time.time() - t0, 3)
        mh_sigs = spark.read.parquet(mh_dir + "/sigs")
        mh_bands = spark.read.parquet(mh_dir + "/bands")

        def _cold_near_dedup() -> None:
            spark.catalog.clearCache()
            dedup.release_cached_signatures()
            _force(dedup.near_dedup_against(docs, mh_sigs, mh_bands))

        times["near_dedup_incremental"] = _timed(
            _cold_near_dedup, "near_dedup_incremental"
        )
    finally:
        shutil.rmtree(mh_dir, ignore_errors=True)
    from logshipper_spark.datapipe import compaction as compaction_mod

    cmp_dir = tempfile.mkdtemp(prefix="bench_cmp_")
    try:
        # 4 committed streaming-layout batch partitions, then one
        # epoch fold + vacuum (one-time, like the index builds)
        for b in range(4):
            bs = docs.filter(f"doc_id % 4 = {b}").select(
                "doc_id", dedup.minhash_signature(F.col("text")).alias("sig")
            )
            bs.write.mode("overwrite").parquet(f"{cmp_dir}/sigs/batch_id={b}")
            dedup.banded_buckets(bs).write.mode("overwrite").parquet(
                f"{cmp_dir}/bands/batch_id={b}"
            )
            spark.createDataFrame([(b,)], "batch_id long").write.mode(
                "append"
            ).parquet(f"{cmp_dir}/_commits")
        t0 = time.time()
        compaction_mod.compact_minhash_index(spark, cmp_dir)
        compaction_mod.vacuum_index(
            spark, cmp_dir, compaction_mod.MINHASH_TABLES
        )
        times["index_compaction"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(cmp_dir, ignore_errors=True)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    qv = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    times["cosine_topk"] = _timed(
        lambda: _force(similarity.cosine_topk(emb, qv, vec_col="embedding", k=10)),
        "cosine_topk",
    )
    times["quantized_topk"] = _timed(
        lambda: _force(
            similarity.quantized_topk(emb, qv, vec_col="embedding", k=10, rerank=4)
        ),
        "quantized_topk",
    )
    from logshipper_spark.datapipe import semdedup as semdedup_mod

    t0 = time.time()
    sd_cents = similarity.kmeans_fit(emb, num_cells=16, dim=len(qv), max_iter=3)
    times["semdedup_kmeans_fit"] = round(time.time() - t0, 3)
    def _cold_semantic_pairs() -> None:
        semdedup_mod.release_cached_cells()  # COLD cell assignment
        _force(semdedup_mod.semantic_pairs(emb, sd_cents, threshold=0.9))

    times["semantic_pairs"] = _timed(_cold_semantic_pairs, "semantic_pairs")
    semdedup_mod.release_cached_cells()
    from logshipper_spark.datapipe import pruning as pruning_mod

    times["prototype_prune"] = _timed(
        lambda: _force(
            pruning_mod.prototype_prune(
                pruning_mod.prototype_scores(emb, sd_cents), 300
            )
        ),
        "prototype_prune",
    )
    sem_dir = tempfile.mkdtemp(prefix="bench_sem_")
    try:
        t0 = time.time()
        semdedup_mod.write_semantic_index(
            emb.filter("vec_id % 5 = 0"), sem_dir, sd_cents, mode="overwrite"
        )
        times["semantic_index_build"] = round(time.time() - t0, 3)

        def _cold_sem_against() -> None:
            semdedup_mod.release_cached_cells()  # COLD cell assignment
            _force(
                semdedup_mod.semantic_dedup_against(emb, sem_dir, threshold=0.9)
            )

        times["semantic_dedup_incremental"] = _timed(
            _cold_sem_against, "semantic_dedup_incremental"
        )
    finally:
        shutil.rmtree(sem_dir, ignore_errors=True)
    semdedup_mod.release_cached_cells()
    spark.catalog.clearCache()  # dedup builders cache signatures internally
    ivf_dir = tempfile.mkdtemp(prefix="bench_ivf_")
    try:
        t0 = time.time()
        similarity.write_ivf_index(emb, ivf_dir, num_cells=16, dim=len(qv))
        times["ivf_index_build"] = round(time.time() - t0, 3)
        times["ivf_topk_indexed"] = _timed(
            lambda: _force(similarity.ivf_topk_indexed(spark, ivf_dir, qv, k=10)),
            "ivf_topk_indexed",
        )
    finally:
        shutil.rmtree(ivf_dir, ignore_errors=True)
    pq_dir = tempfile.mkdtemp(prefix="bench_pq_") + "/pq"
    try:
        t0 = time.time()
        pq_books = similarity.pq_fit(
            emb, m=4, codes_per_sub=16, dim=len(qv), max_iter=3
        )
        similarity.write_pq_index(emb, pq_dir, pq_books)
        times["pq_index_build"] = round(time.time() - t0, 3)
        times["pq_topk"] = _timed(
            lambda: _force(
                similarity.pq_topk(
                    spark, pq_dir, qv, k=10, rerank_df=emb, rerank=4
                )
            ),
            "pq_topk",
        )
        ivfpq_dir = os.path.dirname(pq_dir) + "/ivfpq"
        t0 = time.time()
        similarity.write_ivf_pq(emb, ivfpq_dir, sd_cents, pq_books)
        times["ivf_pq_index_build"] = round(time.time() - t0, 3)
        times["ivf_pq_topk"] = _timed(
            lambda: _force(
                similarity.ivf_pq_topk(
                    spark, ivfpq_dir, qv, k=10, n_probe=4,
                    rerank_df=emb, rerank=4,
                )
            ),
            "ivf_pq_topk",
        )

        def _pq_knn() -> None:
            _force(
                similarity.ivf_pq_knn_join(
                    spark, ivfpq_dir, emb.filter("vec_id < 32"), k=5,
                    n_probe=4,
                )
            )
            similarity.release_cached_probes()

        times["ivf_pq_knn_join"] = _timed(_pq_knn, "ivf_pq_knn_join")
    finally:
        shutil.rmtree(os.path.dirname(pq_dir), ignore_errors=True)

    # headline RETAKE at the end of the capture: the VM's noise storms
    # last minutes (round-3o/3p captures: every early headline run
    # 7-21 s while later rows in the same JVM read best-ever), so
    # best-of-N inside one placement can't ride one out. Sampling the
    # same plan again ~10-20 wall-clock minutes later gives a second
    # independent placement; the headline is the min across both.
    # the cached enriched frame would SUBSTITUTE into the identical
    # retake plan (InMemoryRelation reuse) and we'd time the cache, not
    # the chain — release it first (no later row reads it)
    enriched.unpersist(blocking=True)
    enr_retake = pipeline.normalize_and_enrich(spark, tr)
    _force(enr_retake)  # warm (Janino/JIT already hot from placement 1)
    retake = []
    for _ in range(int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))):
        t0 = time.time()
        _force(enr_retake)
        retake.append(round(time.time() - t0, 3))
    times["pipeline_parse_enrich"] = min(times["pipeline_parse_enrich"],
                                         min(retake))
    turns_per_sec = round(n_turns / times["pipeline_parse_enrich"], 1)
    result["pipeline_runs_retake"] = retake

    result["value"] = turns_per_sec
    result["batch_turns_per_sec_with_sink_io"] = result_batch_tps
    result["batch_turns_per_sec_by_mode"] = batch_tps
    result["query_runs"] = dict(_RUN_LOG)  # full spread per query
    return result


def run_scaling(sf_dir: str, n: int = 4, turns: int | None = None) -> dict:
    """Same job at two parallelism levels (N and 4N cores), fresh JVMs,
    legs INTERLEAVED ABAB — a noise burst that lands during one wall-
    clock window degrades one leg of each level, not every run of one
    level, so the best-per-level pairing stays comparable. Each leg
    takes best-of-4 timed runs in-JVM (this VM's noisy neighbors arrive
    in multi-second bursts that hit high-parallelism runs hardest —
    spare cores absorb them at N=4, not at 4N=16).

    The input is 16x the per-round bench size (9.6M turns;
    `SPARK_GRAFT_SCALING_TURNS` overrides) so per-task work dominates
    fixed per-query overhead — with small inputs the high-core leg is
    overhead-bound and efficiency reads artificially low; the round-3
    chain got fast enough that the round-2 4.8M input hit exactly that
    (16-core leg ~9 s ≈ scheduling floor). N=4 keeps 4N=16 well under
    the VM's 32 cores so the two runs see the same per-core memory
    bandwidth.
    """
    if turns is None:
        turns = int(os.environ.get("SPARK_GRAFT_SCALING_TURNS", "9600000"))
    # legs per level (ABAB...; never AA then BB). The VM's noise bursts
    # disproportionately hit the high-parallelism leg, and they only
    # ever ADD time — more interleaved legs tighten the min estimate of
    # the true quiet-window time symmetrically at both levels.
    n_legs = int(os.environ.get("SPARK_GRAFT_SCALING_LEGS", "3"))
    legs = [c for _ in range(n_legs) for c in (n, 4 * n)]
    per_level: dict[int, list[dict]] = {n: [], 4 * n: []}
    for cores in legs:
        env = dict(
            os.environ, SPARK_GRAFT_CPUS=str(cores),
            SPARK_GRAFT_BENCH_TURNS=str(turns),
            SPARK_GRAFT_BENCH_RUNS=os.environ.get("SPARK_GRAFT_BENCH_RUNS", "6"),
            SPARK_GRAFT_QUERY_RUNS="1",  # secondary queries: 1 timed run per leg
            # fresh 4N JVMs ramp for ~2 evaluations (JIT tiering + heap
            # growth, amplified at high parallelism — measured 57-59 s
            # first run vs 25-29 s steady state); 2 warmups there so all
            # timed runs sample steady state. N-core legs show no ramp.
            SPARK_GRAFT_BENCH_WARMUPS="2" if cores == 4 * n else "1",
            # heap scales with cores, as a real cluster's aggregate
            # executor memory scales with executor count
            SPARK_DRIVER_MEMORY=f"{max(8, cores)}g",
        )
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--pipeline-only", sf_dir],
            env=env, capture_output=True, text=True, check=True,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        per_level[cores].append(json.loads(line))
    tp_n = max(r["value"] for r in per_level[n])
    tp_4n = max(r["value"] for r in per_level[4 * n])
    return {
        "metric": "scaling_efficiency_Nx4",
        "value": round(tp_4n / tp_n / 4.0, 3),
        "unit": "ratio",
        "sf": _sf_of(sf_dir),
        "throughput_turns_per_sec": {f"{n}_cores": tp_n, f"{4 * n}_cores": tp_4n},
        "per_leg_turns_per_sec": {
            f"{n}_cores": [r["value"] for r in per_level[n]],
            f"{4 * n}_cores": [r["value"] for r in per_level[4 * n]],
        },
        "per_leg_pipeline_runs": {
            f"{n}_cores": [r["pipeline_runs"] for r in per_level[n]],
            f"{4 * n}_cores": [r["pipeline_runs"] for r in per_level[4 * n]],
        },
        "queries": {
            f"{n}_cores": per_level[n][0]["queries"],
            f"{4 * n}_cores": per_level[4 * n][0]["queries"],
        },
    }


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        print(json.dumps(run_bench(sf_dir, pipeline_only="--pipeline-only" in sys.argv)))
