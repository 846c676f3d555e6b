"""Schemas and constants for the engine.

The normalized-event schema mirrors the reference's closed field set
(reference: internal/event/event.go:24-38) re-expressed columnar:
Go ``time.Duration`` (ns) is carried as **microseconds** in a LongType
column (``latency_us``); Go ``map[string]any`` Raw is carried as
``map<string,string>`` with nested values kept as their raw JSON text
(lossless, Arrow-safe).

Missing strings are empty strings (``''``), not NULLs, matching Go's
zero values so per-turn equality and ``src == ''`` filters behave
identically to the reference.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ── input: transcripts table (BASELINE.json input_hint, exact shape) ──
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# ── normalized event (reference: internal/event/event.go:24-38) ──
# `event_ts` is the payload-derived timestamp (the reference's
# NormalizedEvent.Timestamp); the transcript's own `ts` column is kept
# separately as arrival/event time for windowed aggregates.
NORMALIZED_FIELDS: list[tuple[str, T.DataType]] = [
    ("trace_id", T.StringType()),
    ("span_id", T.StringType()),
    ("event_ts", T.TimestampType()),
    ("src_service", T.StringType()),
    ("dst_service", T.StringType()),
    ("operation", T.StringType()),
    ("status_code", T.IntegerType()),
    ("latency_us", T.LongType()),
    ("level", T.StringType()),
    ("format", T.StringType()),
    ("source_name", T.StringType()),
    ("raw", T.MapType(T.StringType(), T.StringType())),
]
NORMALIZED_COLUMN_NAMES = [name for name, _ in NORMALIZED_FIELDS]

# format values (reference: internal/parse/parse.go:50-86, template.go:51)
FORMAT_JSON = "json"
FORMAT_ECS = "ecs_json"
FORMAT_METRIC = "metric_json"
FORMAT_TEMPLATE = "template"
FORMAT_PLAIN = "plain"
FORMAT_EMPTY = "empty"

# Deterministic stand-in for the reference's time.Now() fallback
# (reference: internal/parse/parse.go:107-142). Pinned per run so
# results are reproducible; production runs pass the batch ingest time.
DEFAULT_INGEST_TS = "2024-01-01 00:00:00"

# ── edge aggregate (reference: internal/graph/types.go:30-44) ──
EDGE_AGG_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType()),
        T.StructField("dst", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("call_count", T.LongType()),
        T.StructField("error_count", T.LongType()),
        T.StructField("latency_sum_us", T.LongType()),
        T.StructField("latency_p99_us", T.LongType()),
        T.StructField("first_seen", T.TimestampType()),
        T.StructField("last_seen", T.TimestampType()),
    ]
)

# ── lineage / counters checkpoint row (north rule) ──
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("stage", T.StringType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("rows_in", T.LongType()),
        T.StructField("rows_out", T.LongType()),
        T.StructField("counter", T.StringType()),
        T.StructField("value", T.LongType()),
        T.StructField("committed_at", T.TimestampType()),
    ]
)
