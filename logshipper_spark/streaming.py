"""Structured Streaming wiring: the reference's long-running collector
loop (reference: internal/pipeline/pipeline.go:38-175, bounded channels
+ goroutines) re-expressed as a Structured Streaming query.

Two modes:

* ``run_stream`` — `readStream` on the transcript table directory →
  ``foreachBatch`` running the full batch pipeline (parse → enrich →
  route fan-out → per-sink windowed aggregates) with exactly-once
  restart semantics: Spark's checkpoint gives at-least-once batch
  replay, and batch outputs are written under ``batch_id=N`` paths
  (idempotent overwrite) with the lineage/counter rows appended last —
  a replayed half-written batch simply re-commits the same result.
  The reference has no restart story at all (process state is lost);
  this is the north rule's addition.

* ``streaming_sink_counts`` — the per-sink windowed aggregate as a
  *native* streaming aggregation with an event-time watermark: late
  turns beyond the watermark are dropped (documented delta vs the
  reference, which only knows processing time — SURVEY.md §2.10).

Backpressure: ``maxFilesPerTrigger`` plays the reference's bounded
channel capacity (pipeline.go:49-52).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import gen, pipeline, route
from .schemas import DEFAULT_INGEST_TS, TRANSCRIPT_SCHEMA


def read_transcript_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def run_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    run_id: str = "stream",
    ingest_ts: str = DEFAULT_INGEST_TS,
    rules: list[tuple[str, str, int]] | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    chaos=None,
):
    """Start (or resume) the streaming pipeline. With
    ``available_now=True`` the query drains all currently-available
    input and stops — the batch-oriented test/benchmark mode; a
    production run would use a continuous trigger instead.

    Restart semantics: Spark's streaming checkpoint tracks which input
    files belong to which epoch; on restart, finished epochs are not
    re-read, and a half-finished epoch is replayed — idempotent because
    `pipeline.run_batch` overwrites its own ``batch_id=N`` output paths
    before appending lineage.

    ``chaos`` (tests only): callable invoked with the batch id after
    the batch's outputs AND lineage commit but before Spark's streaming
    checkpoint records the epoch — raising there reproduces the
    crash-in-the-commit-gap window deterministically (the case where a
    naive design would double-commit counters on replay).
    """
    rules = rules or gen.routing_rules()

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # epoch replay after a crash-between-commit: outputs are
        # idempotent anyway (per-batch overwrite), but skipping avoids
        # redoing the work
        if batch_id in pipeline.completed_batches(spark, out_dir, run_id=run_id):
            return
        pipeline.run_batch(
            spark,
            batch_df,
            out_dir,
            run_id=run_id,
            batch_id=batch_id,
            ingest_ts=ingest_ts,
            rules=rules,
            write=True,
        )
        if chaos is not None:
            chaos(batch_id)

    stream = read_transcript_stream(spark, input_dir, max_files_per_trigger)
    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_first_seen(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    rules: list[tuple[str, str, int]] | None = None,
    ingest_ts: str = DEFAULT_INGEST_TS,
    available_now: bool = True,
    ttl: str | None = None,
):
    """New-edge detection as a *native* stateful stream (reference:
    graph.go:108-127 — the CallGraph emits an edge event the first time
    a (src, dst, op) key appears). ``dropDuplicates`` on the edge key is
    exactly that operator: state = the edge set (bounded by the service
    topology, the same state the reference's in-memory map holds), and
    each key is emitted exactly once across the stream's lifetime,
    surviving restarts via the checkpoint.

    With ``ttl`` set (e.g. ``"5 minutes"``), the streaming twin of the
    reference's edge TTL eviction (graph.go:247-293, A7): state is a
    watermark-bounded ``dropDuplicatesWithinWatermark`` on event time,
    so an edge that goes quiet past the TTL is evicted and its
    re-appearance is a NEW edge event again — exactly the batch
    ``aggregate.edge_sessions`` lifetime semantics, with state bounded
    by (topology × active window) instead of the whole history.

    Delta vs the batch ``aggregate.first_seen_edges``: "first" here is
    arrival order (processing time), as in the reference; the batch
    operator reports min(event_ts).
    """
    stream = read_transcript_stream(spark, input_dir)
    enriched = pipeline.normalize_and_enrich(
        spark, stream, ingest_ts=ingest_ts, skip_turn_rank=True
    )
    edges = enriched.filter(
        (F.col("src_service") != "") & (F.col("dst_service") != "")
    ).select(
        F.col("src_service").alias("src"),
        F.col("dst_service").alias("dst"),
        F.col("operation").alias("op"),
        F.col("event_ts").alias("first_seen"),
    )
    if ttl is not None:
        edges = edges.withWatermark("first_seen", ttl).dropDuplicatesWithinWatermark(
            ["src", "dst", "op"]
        )
    else:
        edges = edges.dropDuplicates(["src", "dst", "op"])
    writer = (
        edges.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_exact_dedup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str,
    text_col: str = "text",
    ts_col: str = "ts",
    ttl: str = "1 hour",
    available_now: bool = True,
):
    """Streaming exact dedup for training-data ingestion: documents
    arriving as parquet files are emitted once per distinct text within
    the ``ttl`` event-time horizon, keyed by the same 128-bit composite
    hash the batch ``datapipe.dedup.exact_dedup`` groups on (two-seed
    xxhash64 — one 64-bit key silently merges ~n²/2^65 distinct docs at
    corpus scale).

    State posture at 100 TB: ``dropDuplicatesWithinWatermark`` holds one
    state row per distinct key seen within the watermark window — 16
    bytes of key, independent of document size, and the watermark evicts
    keys older than ``ttl``, so state is bounded by (distinct docs per
    TTL window), not stream lifetime. The key columns are computed in a
    narrow projection; the stateful operator shuffles only
    (key, event-time) pairs. ``schema`` is required: streaming parquet
    sources cannot infer schemas (and an empty first listing would
    throw — CLAUDE.md round-2 gotcha)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    keyed = stream.withColumn(
        "_h0", F.xxhash64(F.col(text_col), F.lit(0))
    ).withColumn("_h1", F.xxhash64(F.col(text_col), F.lit(1)))
    deduped = (
        keyed.withWatermark(ts_col, ttl)
        .dropDuplicatesWithinWatermark(["_h0", "_h1"])
        .drop("_h0", "_h1")
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_sink_counts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
    window_duration: str = "1 minute",
    rules: list[tuple[str, str, int]] | None = None,
    ingest_ts: str = DEFAULT_INGEST_TS,
    available_now: bool = True,
):
    """Native streaming per-sink windowed aggregate with a watermark.

    The full parse+enrich chain is narrow, so it rides inside the
    streaming micro-batch untouched; the windowed `groupBy` runs as a
    stateful streaming aggregation whose state is bounded by the
    watermark (append mode emits a window once it is final)."""
    stream = read_transcript_stream(spark, input_dir)
    enriched = pipeline.normalize_and_enrich(
        spark, stream, ingest_ts=ingest_ts, skip_turn_rank=True
    )
    routed = route.routed_rows(enriched, rules or gen.routing_rules())
    is_error = route.is_error_pattern()
    counts = (
        routed.withWatermark("ts", watermark)
        .groupBy(
            "sink",
            "conv_id",
            F.window(F.col("ts"), window_duration).alias("w"),
        )
        .agg(
            F.count("*").alias("turn_count"),
            F.count_if(F.col("tool") != "").alias("tool_call_count"),
            F.count_if(is_error).alias("error_pattern_count"),
        )
        .select(
            "sink", "conv_id", F.col("w.start").alias("window_start"),
            "turn_count", "tool_call_count", "error_pattern_count",
        )
    )
    writer = (
        counts.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
