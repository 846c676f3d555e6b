"""Memory/shuffle posture of the headline queries at scale.

Runs each headline operator once at the scale-headroom input size
(default 6M turns; ``SPARK_GRAFT_POSTURE_TURNS``) in a single JVM with
the Spark UI's REST API enabled, and attributes per-query stage metrics
(input/output bytes, shuffle read/write, memory/disk spill, peak
single-task execution memory) by diffing the completed-stage list
before and after each query. Prints a JSON summary and a ready-to-paste
markdown table with per-row byte costs — the bytes-per-row basis for
the 100 TB extrapolation (wall-time alone says nothing about whether a
partition fits an executor).

Usage: python tools/mem_posture.py [sf_dir]   (writes nothing; ~5 min)

Not part of bench.py because the UI server itself costs a little and
the bench must stay measurement-pure.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from logshipper_spark import aggregate as agg  # noqa: E402
from logshipper_spark import anomaly, gen, pipeline, route  # noqa: E402
from logshipper_spark import temporal, transcript  # noqa: E402
from logshipper_spark.datapipe import compaction  # noqa: E402
from logshipper_spark.datapipe import dedup  # noqa: E402
from logshipper_spark.datapipe import packing  # noqa: E402
from logshipper_spark.datapipe import semdedup  # noqa: E402
from logshipper_spark.datapipe import similarity  # noqa: E402
from logshipper_spark.datapipe import substr  # noqa: E402
from logshipper_spark.datapipe import textstats  # noqa: E402
from logshipper_spark.datapipe import tokenize  # noqa: E402
from logshipper_spark.session import get_spark  # noqa: E402

UI = "http://localhost:4040/api/v1"  # overwritten from sc.uiWebUrl in measure()

STAGE_FIELDS = (
    "inputBytes",
    "outputBytes",
    "shuffleReadBytes",
    "shuffleWriteBytes",
    "memoryBytesSpilled",
    "diskBytesSpilled",
)


def _get(path: str):
    with urllib.request.urlopen(f"{UI}{path}", timeout=60) as r:
        return json.loads(r.read())


def _app_id() -> str:
    return _get("/applications")[0]["id"]


def _stages(app: str) -> dict[int, dict]:
    # one entry per (stageId, attempt); keep the latest attempt
    out: dict[int, dict] = {}
    for s in _get(f"/applications/{app}/stages?status=complete"):
        out[s["stageId"]] = s
    return out


def _peak_exec_mem(app: str, stage_id: int) -> int:
    """Max per-task peak execution memory for a stage (bytes)."""
    try:
        detail = _get(
            f"/applications/{app}/stages/{stage_id}?withSummaries=true"
            "&quantiles=1.0"
        )
        for attempt in detail if isinstance(detail, list) else [detail]:
            dist = attempt.get("taskMetricsDistributions")
            if dist and "peakExecutionMemory" in dist:
                return int(max(dist["peakExecutionMemory"]))
    except Exception:
        pass
    return 0


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def measure(sf_dir: str) -> dict:
    n_turns = int(os.environ.get("SPARK_GRAFT_POSTURE_TURNS", "6000000"))
    spark = get_spark(
        app_name="logshipper-mem-posture",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    global UI
    # the UI port walks up from 4040 when taken by another JVM
    UI = spark.sparkContext.uiWebUrl.rstrip("/") + "/api/v1"
    app = _app_id()

    tr = gen.transcripts(spark, n_turns).cache()
    tr.count()
    enriched = pipeline.normalize_and_enrich(spark, tr)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    # same input shapes as bench.py: multi-line docs for the cross-doc
    # line pass, prefix queries for BM25, trained cells for semdedup
    multi_line = docs.selectExpr(
        "doc_id",
        "concat(text, '.', '\n', '(c) ', upper(source),"
        " ' all rights reserved.', '\n', 'ok') AS text",
    )
    bm25_queries = textstats.prefix_queries(docs, mod=37, rem=3, n_tokens=5)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    dim = len(emb.head()["embedding"])
    sd_cents = similarity.kmeans_fit(emb, num_cells=16, dim=dim, max_iter=3)

    # round-4 heavy-family inputs (r3 verdict next-step #6): the IVF-PQ
    # index and the two-batch minhash index are SETUP (one-time build);
    # only the serving/maintenance op is measured
    pq_books = similarity.pq_fit(emb, m=4, codes_per_sub=8, dim=dim, max_iter=2)
    ivfpq_dir = tempfile.mkdtemp(prefix="posture_ivfpq_") + "/idx"
    similarity.write_ivf_pq(emb, ivfpq_dir, sd_cents, pq_books)
    deploys = tr.filter(
        (F.crc32(F.col("conv_id")) % 37 == 0) & (F.col("turn_idx") == 0)
    ).select(
        F.col("role").alias("key"), "ts",
        (F.crc32(F.col("conv_id")) % 100000).alias("ver"),
    )
    asof_probe = tr.select("conv_id", "turn_idx", F.col("role").alias("key"), "ts")
    sft_pairs_df = transcript.sft_pairs(tr).select(
        F.xxhash64("conv_id", "response_turn_idx").alias("pair_id"),
        "prompt",
        "response",
    )
    mh_dir = tempfile.mkdtemp(prefix="posture_mhidx_") + "/idx"
    for batch_id, part in ((0, "doc_id % 5 = 0"), (1, "doc_id % 5 = 1")):
        sigs = docs.filter(part).select(
            "doc_id", dedup.minhash_signature(F.col("text")).alias("sig")
        )
        sigs.write.mode("overwrite").parquet(f"{mh_dir}/sigs/batch_id={batch_id}")
        dedup.banded_buckets(sigs).write.mode("overwrite").parquet(
            f"{mh_dir}/bands/batch_id={batch_id}"
        )
        spark.createDataFrame([(batch_id,)], "batch_id long").write.mode(
            "append"
        ).parquet(f"{mh_dir}/_commits")
    dedup.release_cached_signatures()

    def _sft_mask_pack() -> None:
        lanes = sft_pairs_df.select(F.col("prompt").alias("text")).unionAll(
            sft_pairs_df.select(F.col("response").alias("text"))
        )
        vocab = tokenize.vocab_build(lanes, max_size=4096, min_count=2)
        ex = packing.sft_examples(sft_pairs_df, vocab)
        _force(packing.pack_masked(ex, budget=2048))

    def _index_compaction() -> None:
        res = compaction.compact_minhash_index(spark, mh_dir)
        if not res["compacted"]:
            raise RuntimeError(f"compaction did not land: {res}")
        idx_sigs, idx_bands = compaction.read_minhash_index(spark, mh_dir)
        _force(
            dedup.near_dedup_against(docs, idx_sigs, idx_bands, threshold=0.5)
        )
        dedup.release_cached_signatures()

    def _ivf_pq_knn() -> None:
        _force(similarity.ivf_pq_knn_join(spark, ivfpq_dir, emb, k=10, n_probe=4))
        similarity.release_cached_probes()

    out_dir = tempfile.mkdtemp(prefix="posture_batch_")

    def _full_batch() -> None:
        pipeline.run_batch(
            spark, tr, out_dir, run_id="posture", batch_id=0,
            sink_write_mode="single_pass",
        )

    queries = [
        ("pipeline_parse_enrich", n_turns, lambda: _force(enriched)),
        (
            "route_sink_counts",
            n_turns,
            lambda: _force(
                route.sink_counts(
                    route.routed_rows(enriched, gen.routing_rules()), ts_col="ts"
                )
            ),
        ),
        (
            "edge_agg",
            n_turns,
            lambda: _force(
                agg.edge_agg(
                    enriched, ts_col="event_ts",
                    order_cols=["ts", "conv_id", "turn_idx"],
                )
            ),
        ),
        (
            "anomaly_zscore",
            n_turns,
            lambda: _force(
                anomaly.rolling_zscore(
                    enriched.filter(
                        "src_service <> '' AND dst_service <> ''"
                    ).selectExpr(
                        "src_service || '|' || dst_service AS edge_key",
                        "ts", "conv_id", "turn_idx",
                        "latency_us / 1000.0 AS value",
                    ),
                    key_cols=["edge_key"], value_col="value",
                    order_cols=["ts", "conv_id", "turn_idx"],
                )
            ),
        ),
        (
            "zscore_blocked",
            n_turns,
            lambda: (
                _force(
                    anomaly.rolling_zscore_blocked(
                        enriched.filter(
                            "src_service <> '' AND dst_service <> ''"
                        ).selectExpr(
                            "src_service || '|' || dst_service AS edge_key",
                            "try_cast(substring(conv_id, 6) AS long)"
                            " * 1024 + turn_idx AS event_id",
                            "latency_us AS value",
                        ),
                        key_cols=["edge_key"], value_col="value",
                        order_col="event_id", block_size=1 << 22,
                    )
                ),
                anomaly.release_cached_rollups(),
            )[-1],
        ),
        ("full_batch_single_pass", n_turns, _full_batch),
        (
            "minhash_lsh",
            n_docs,
            lambda: _force(dedup.minhash_lsh_pairs(docs, threshold=0.5)),
        ),
        (
            "substr_pairs",
            n_docs,
            lambda: _force(
                substr.substr_dup_pairs(docs, w=8, window=4, min_shared=2)
            ),
        ),
        (
            "line_dedup",
            n_docs,
            lambda: _force(dedup.line_dedup(multi_line)),
        ),
        (
            "bm25_topk",
            n_docs,
            lambda: _force(
                textstats.bm25_topk(docs, bm25_queries, k=10, max_df_frac=0.9)
            ),
        ),
        (
            "semantic_pairs",
            n_docs,
            lambda: _force(
                semdedup.semantic_pairs(emb, sd_cents, threshold=0.9)
            ),
        ),
        (
            "asof_join_blocked",
            n_turns,
            lambda: _force(
                temporal.asof_join_blocked(
                    asof_probe, deploys, ["key"], payloads=["ver"],
                    tiebreak="ver", block_s=3600,
                )
            ),
        ),
        ("sft_mask_pack", n_turns, _sft_mask_pack),
        ("ivf_pq_knn_join", emb.count(), _ivf_pq_knn),
        ("index_compaction", n_docs, _index_compaction),
    ]

    rows = []
    try:
        for name, n_rows, fn in queries:
            before = set(_stages(app))
            t0 = time.time()
            fn()
            wall = time.time() - t0
            # stages complete asynchronously after the job returns
            time.sleep(2)
            after = _stages(app)
            new = [after[sid] for sid in after.keys() - before]
            tot = {f: sum(int(s.get(f) or 0) for s in new) for f in STAGE_FIELDS}
            peak = max(
                (_peak_exec_mem(app, s["stageId"]) for s in new), default=0
            )
            rows.append(
                {
                    "query": name,
                    "rows": n_rows,
                    "wall_sec": round(wall, 2),
                    "stages": len(new),
                    **tot,
                    "peakTaskExecutionMemory": peak,
                }
            )
            dedup.release_cached_signatures()
            substr.release_cached_fingerprints()
            textstats.release_cached_postings()
            semdedup.release_cached_cells()
            spark.catalog.clearCache()
            tr.cache().count()  # keep the input cached between queries
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    execs = _get(f"/applications/{app}/executors")
    peak_heap = max(
        int((e.get("peakMemoryMetrics") or {}).get("JVMHeapMemory", 0))
        for e in execs
    )
    return {
        "n_turns": n_turns,
        "cores": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "driver_memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        "peak_jvm_heap_bytes": peak_heap,
        "queries": rows,
    }


def _mb(b: int) -> str:
    return f"{b / 1048576:.1f}"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    res = measure(sf_dir)
    print(json.dumps(res))
    print()
    print(
        "| query | rows | wall s | shuffle write MB | shuffle read MB |"
        " spill mem/disk MB | peak task exec mem MB | shuffle B/row |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for r in res["queries"]:
        print(
            f"| {r['query']} | {r['rows']:,} | {r['wall_sec']} |"
            f" {_mb(r['shuffleWriteBytes'])} | {_mb(r['shuffleReadBytes'])} |"
            f" {_mb(r['memoryBytesSpilled'])}/{_mb(r['diskBytesSpilled'])} |"
            f" {_mb(r['peakTaskExecutionMemory'])} |"
            f" {r['shuffleWriteBytes'] / max(1, r['rows']):.1f} |"
        )
    print(
        f"\npeak JVM heap: {_mb(res['peak_jvm_heap_bytes'])} MB of"
        f" {res['driver_memory']} on local[{res['cores']}]"
    )


if __name__ == "__main__":
    main()
