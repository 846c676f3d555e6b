"""Parse layer: raw log/transcript text → normalized event columns.

Re-expresses the reference's per-line parser chain (reference:
internal/parse/parse.go:50-86 dispatcher; json.go, ecs.go, metric.go)
as a single declarative column-expression DAG:

  * the text is JSON-decoded **once** into a ``map<string,string>``
    column (nested objects kept as raw JSON text — mirrors the single
    ``json.Unmarshal`` pass at parse.go:56-69);
  * format detection is a ``when()`` cascade on cheap predicates
    (first-byte gate → metric-key check → ECS markers → generic JSON),
    mirroring the decision tree at parse.go:50-86 / docs/log_format/
    detection.md;
  * every field extraction is a ``coalesce`` over alias-group
    candidates (json.go:94-207), all native expressions — the whole
    layer stays inside whole-stage codegen; no Python runs per row.

Everything is ANSI-mode safe (``try_cast`` / ``try_element_at`` /
``try_to_timestamp``) so the layer behaves identically under the
caller's session config.

Determinism policy: the reference falls back to ``time.Now()`` when a
payload carries no parseable timestamp (parse.go:107-142); we use a
pinned per-run ``ingest_ts`` constant instead so results are
reproducible (documented delta).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .schemas import (
    DEFAULT_INGEST_TS,
    FORMAT_ECS,
    FORMAT_EMPTY,
    FORMAT_JSON,
    FORMAT_METRIC,
    FORMAT_PLAIN,
    NORMALIZED_COLUMN_NAMES,
)

# Gate for timestamp-looking strings: both Go layout families require a
# full date+time prefix (json.go:190-196); the gate keeps Spark's more
# liberal ISO parser from accepting date-only strings Go would reject.
_TS_STRING_RE = r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}"
# optional exponent: a JSON NUMBER like 2e2 / 1.5e3 / 1.7e9 reaches
# from_json's map<string,string> as its lexeme, and the reference's
# json.Unmarshal float64 path accepts scientific notation (truncating
# to int downstream) — rejecting the exponent here silently zeroed
# status/latency and discarded epoch timestamps for such lines
_NUM_RE = r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$"
_INT_RE = r"^-?\d+$"
# duration regex, reference: internal/parse/json.go:130 (exponent
# admitted for the bare-number case — Go's float64 path, not its
# string-duration regex)
_DURATION_RE = r"^([\d.]+(?:[eE][+-]?\d+)?)\s*(ms|s|µs|us|ns)?$"

# alias groups (reference: internal/parse/json.go)
TS_KEYS = ["ts", "time", "@timestamp", "timestamp", "datetime"]  # json.go:183
LEVEL_KEYS = ["level", "severity", "lvl", "log_level"]  # json.go:95
SERVICE_KEYS = ["service", "service_name", "app", "application", "component"]  # json.go:104
STATUS_KEYS = ["status_code", "status", "http.status", "code", "http_status"]  # json.go:113
LATENCY_KEYS = [  # json.go:133-138
    "latency", "duration", "elapsed", "response_time",
    "latency_ms", "duration_ms", "elapsed_ms",
    "latency_s", "duration_s",
    "request_time",
]
TRACE_KEYS = ["trace_id", "traceId", "trace.id", "X-Trace-Id", "x-trace-id"]  # json.go:62
SPAN_KEYS = ["span_id", "spanId", "span.id"]  # json.go:63
DST_KEYS = ["upstream", "target", "remote_service", "peer.service", "dst_service"]  # json.go:64


def _get(raw: Column, key: str) -> Column:
    """Map lookup, NULL when absent (ANSI-safe)."""
    return F.try_element_at(raw, F.lit(key))


def _nonempty(raw: Column, key: str) -> Column:
    """Go firstString semantics: value present and non-empty, else NULL."""
    return F.nullif(_get(raw, key), F.lit(""))


def first_string(raw: Column, keys: list[str]) -> Column:
    """coalesce over an alias group (reference: json.go:173-180)."""
    return F.coalesce(*[_nonempty(raw, k) for k in keys])


def extract_level(raw: Column) -> Column:
    """reference: json.go:94-101 (lowered)."""
    return F.lower(first_string(raw, LEVEL_KEYS))


def extract_service(raw: Column) -> Column:
    """reference: json.go:103-110."""
    return first_string(raw, SERVICE_KEYS)


def extract_status_code(raw: Column) -> Column:
    """reference: json.go:112-128. First alias key whose value parses;
    integer strings via Atoi, numbers truncated toward zero."""
    cands = []
    for k in STATUS_KEYS:
        v = _get(raw, k)
        cands.append(
            F.when(v.rlike(_INT_RE), v.try_cast("int")).when(
                v.rlike(_NUM_RE), v.try_cast("double").try_cast("int")
            )
        )
    return F.coalesce(*cands, F.lit(0))


def extract_latency_us(raw: Column) -> Column:
    """reference: json.go:130-171, as microseconds (Go stores ns).

    Bare numbers: seconds for ``*_s`` keys else milliseconds (the Go
    float64 path); unit-suffixed strings via the duration regex with
    ms default. Truncation toward zero matches ``time.Duration(float)``.

    One anchored regex per alias key validates + extracts the number;
    the unit is recovered with cheap suffix tests (the regex admits
    only ms|s|µs|us|ns endings, so EndsWith is exact and avoids a
    second regex evaluation per key).
    """
    cands = []
    for k in LATENCY_KEYS:
        v = _get(raw, k)
        num = F.regexp_extract(v, _DURATION_RE, 1).try_cast("double")
        default_mult_ns = 1e9 if k.endswith("_s") else 1e6
        mult_ns = (
            F.when(v.endswith("ms"), F.lit(1e6))
            .when(v.endswith("µs") | v.endswith("us"), F.lit(1e3))
            .when(v.endswith("ns"), F.lit(1.0))
            .when(v.endswith("s"), F.lit(1e9))
            .otherwise(F.lit(default_mult_ns))
        )
        # two-step truncation mirrors Go exactly: time.Duration(n*mult)
        # truncates at ns, then integer-divides to µs
        ns = (num * mult_ns).try_cast("long")
        cands.append(F.floor(ns / 1000).try_cast("long"))
    return F.coalesce(*cands, F.lit(0).cast("long"))


def _ts_candidate(v: Column) -> Column:
    """One alias-key timestamp candidate (reference: json.go:182-207):
    date-time strings via the layout family; numbers as unix epoch
    (>1e12 → millis, else seconds)."""
    d = v.try_cast("double")
    return F.when(v.rlike(_TS_STRING_RE), F.try_to_timestamp(v)).when(
        v.rlike(_NUM_RE),
        F.when(d > 1e12, F.timestamp_millis(d.try_cast("long"))).otherwise(
            F.timestamp_seconds(d.try_cast("long"))
        ),
    )


def extract_timestamp(raw: Column) -> Column:
    """reference: json.go:182-207 (no fallback here; caller coalesces
    with the pinned ingest_ts)."""
    return F.coalesce(*[_ts_candidate(_get(raw, k)) for k in TS_KEYS])


def extract_operation(raw: Column) -> Column:
    """reference: json.go:68-80 — explicit operation, else method+url
    synthesis."""
    explicit = first_string(raw, ["operation", "event", "rpc.method"])
    method = first_string(raw, ["method", "http.method"])
    url = first_string(raw, ["url", "path", "uri", "http.url", "http.path"])
    return F.coalesce(
        explicit,
        F.when(method.isNotNull() & url.isNotNull(), F.concat(method, F.lit(" "), url)),
        method,
        url,
    )


# ── ECS (reference: internal/parse/ecs.go) ──
#
# The nested ECS fields decode ONCE per row via a single from_json with
# this partial struct schema (replacing a dozen per-field
# get_json_object calls, each of which re-parsed the nested JSON text).
# String leaf types keep the reference's token-then-coerce semantics.

ECS_SCHEMA = (
    "struct<"
    "log:struct<level:string>,"
    "service:struct<name:string>,"
    "trace:struct<id:string>,"
    "span:struct<id:string>,"
    "http:struct<request:struct<method:string>,"
    "response:struct<status_code:string>>,"
    "url:struct<path:string,full:string>,"
    "event:struct<duration:string>,"
    "destination:struct<address:string>,"
    "server:struct<address:string>"
    ">"
)


def is_ecs(raw: Column, ecs: Column) -> Column:
    """reference: ecs.go:10-26."""
    return (
        F.map_contains_key(raw, "@timestamp")
        | F.map_contains_key(raw, "ecs.version")
        | F.map_contains_key(raw, "log.level")
        | ecs["log"]["level"].isNotNull()
    )


def ecs_timestamp(raw: Column) -> Column:
    """reference: ecs.go:81-87 — @timestamp via RFC3339(Nano) only."""
    v = _get(raw, "@timestamp")
    return F.when(v.rlike(_TS_STRING_RE), F.try_to_timestamp(v))


def ecs_level(raw: Column, ecs: Column) -> Column:
    """reference: ecs.go:92-101 — nested log.level first, flat key second."""
    return F.lower(
        F.coalesce(
            F.nullif(ecs["log"]["level"], F.lit("")),
            _get(raw, "log.level"),
        )
    )


def ecs_operation(ecs: Column) -> Column:
    """reference: ecs.go:126-142 — UPPER(method) + url.path (fallback
    url.full); method alone if no path; never path alone."""
    method = F.nullif(ecs["http"]["request"]["method"], F.lit(""))
    path = F.coalesce(
        F.nullif(ecs["url"]["path"], F.lit("")),
        F.nullif(ecs["url"]["full"], F.lit("")),
    )
    return F.when(
        method.isNotNull() & path.isNotNull(),
        F.concat(F.upper(method), F.lit(" "), path),
    ).when(method.isNotNull(), F.upper(method))


def ecs_latency_us(ecs: Column) -> Column:
    """reference: ecs.go:120-124 — event.duration in ns, only if > 0;
    int64-truncated at ns before the µs division (two-step, as Go)."""
    ns = ecs["event"]["duration"].try_cast("double")
    return F.when(ns > 0, F.floor(ns.try_cast("long") / 1000).try_cast("long"))


def ecs_dst_service(ecs: Column) -> Column:
    """reference: ecs.go:144-151 — destination.address else server.address."""
    return F.coalesce(
        F.nullif(ecs["destination"]["address"], F.lit("")),
        F.nullif(ecs["server"]["address"], F.lit("")),
    )


# ── dispatcher (reference: internal/parse/parse.go:50-86) ──


def parse_normalized(
    df: DataFrame,
    text_col: str = "text",
    source_name: Column | str = "spark",
    ingest_ts: str = DEFAULT_INGEST_TS,
) -> DataFrame:
    """Append the normalized-event columns to ``df``.

    ``source_name`` may be a literal string or a Column (for transcripts
    the role column plays the reference's source name, backfilling
    src_service downstream). Every input row yields exactly one output
    row — nothing is ever dropped (docs/normalization-spec.md:250-261);
    ``parse_ok`` marks rows the reference would count as parse errors
    (empty src_service, parse.go:72-85).
    """
    src_name = source_name if isinstance(source_name, Column) else F.lit(source_name)
    ingest = F.lit(ingest_ts).cast("timestamp")
    text = F.col(text_col)

    out = df.withColumn("_s", F.trim(text))
    s = F.col("_s")
    # first-byte gate before the (single) JSON decode — parse.go:88-93
    out = out.withColumn(
        "_raw",
        F.when(
            F.substring(s, 1, 1).isin("{", "["),
            F.from_json(s, "map<string,string>"),
        ),
    )
    raw = F.col("_raw")
    # Nested ECS fields decode once — and only for rows whose decoded
    # map carries an ECS marker key (cheap map probes); generic-JSON
    # rows never pay the second parse.
    ecs_marker = (
        F.map_contains_key(raw, "@timestamp")
        | F.map_contains_key(raw, "ecs.version")
        | F.map_contains_key(raw, "log.level")
        | F.map_contains_key(raw, "log")
    )
    out = out.withColumn("_ecs", F.when(ecs_marker, F.from_json(s, ECS_SCHEMA)))
    ecs = F.col("_ecs")

    is_metric = F.map_contains_key(raw, "metric") & F.map_contains_key(raw, "value")
    fmt = (
        F.when(s == "", F.lit(FORMAT_EMPTY))
        .when(raw.isNull(), F.lit(FORMAT_PLAIN))
        .when(is_metric, F.lit(FORMAT_METRIC))
        .when(is_ecs(raw, ecs), F.lit(FORMAT_ECS))
        .otherwise(F.lit(FORMAT_JSON))
    )
    out = out.withColumn("format", fmt)
    fmt = F.col("format")
    is_json = fmt == FORMAT_JSON
    is_ecs_f = fmt == FORMAT_ECS
    is_met = fmt == FORMAT_METRIC

    def blank(c: Column) -> Column:
        return F.coalesce(c, F.lit(""))

    cols = {
        "trace_id": blank(F.when(is_json, first_string(raw, TRACE_KEYS)).when(
            is_ecs_f, F.nullif(ecs["trace"]["id"], F.lit(""))
        )),
        "span_id": blank(F.when(is_json, first_string(raw, SPAN_KEYS)).when(
            is_ecs_f, F.nullif(ecs["span"]["id"], F.lit(""))
        )),
        "event_ts": F.coalesce(
            F.when(is_json | is_met, extract_timestamp(raw)).when(
                is_ecs_f, ecs_timestamp(raw)
            ),
            ingest,
        ),
        "src_service": blank(
            F.when(is_json | is_met, extract_service(raw)).when(
                is_ecs_f, F.nullif(ecs["service"]["name"], F.lit(""))
            )
        ),
        "dst_service": blank(
            F.when(is_json, first_string(raw, DST_KEYS)).when(
                is_ecs_f, ecs_dst_service(ecs)
            )
        ),
        "operation": blank(
            F.when(is_json, extract_operation(raw))
            .when(is_ecs_f, ecs_operation(ecs))
            .when(is_met, _get(raw, "metric"))
        ),
        "status_code": F.coalesce(
            F.when(is_json, extract_status_code(raw)).when(
                is_ecs_f, ecs["http"]["response"]["status_code"].try_cast("int")
            ),
            F.lit(0),
        ),
        "latency_us": F.coalesce(
            F.when(is_json, extract_latency_us(raw)).when(is_ecs_f, ecs_latency_us(ecs)),
            F.lit(0).cast("long"),
        ),
        "level": blank(
            F.when(is_json, extract_level(raw)).when(is_ecs_f, ecs_level(raw, ecs))
        ),
        "source_name": src_name,
        "raw": F.coalesce(
            F.when(fmt == FORMAT_PLAIN, F.create_map(F.lit("message"), text)).when(
                fmt == FORMAT_EMPTY,
                F.create_map().cast("map<string,string>"),
            ),
            raw,
        ),
    }
    for name, col in cols.items():
        out = out.withColumn(name, col)
    out = out.withColumn("parse_ok", F.col("src_service") != "")
    return out.drop("_s", "_raw", "_ecs")


def normalized_select(df: DataFrame) -> DataFrame:
    """Project to the bare normalized schema (column order pinned)."""
    return df.select(*NORMALIZED_COLUMN_NAMES)


# ── event predicates / derived keys (reference: internal/event/) ──


def correlation_key(
    trace_id: Column, src: Column, dst: Column, op: Column
) -> Column:
    """trace_id when set, else "src->dst:op" (reference:
    internal/event/helpers.go:166-171)."""
    return F.coalesce(
        F.nullif(trace_id, F.lit("")),
        F.concat(src, F.lit("->"), dst, F.lit(":"), op),
    )


def is_metric_event(latency_us: Column, status_code: Column) -> Column:
    """Latency > 0 or StatusCode >= 100 (reference:
    internal/event/validate.go:19-21)."""
    return (latency_us > 0) | (status_code >= 100)


def has_correlation_key(trace_id: Column, src: Column, dst: Column) -> Column:
    """trace_id set, or both src and dst set (reference:
    internal/event/validate.go:24-26)."""
    return (trace_id != "") | ((src != "") & (dst != ""))


def truncate_message(msg: Column, max_chars: int = 120) -> Column:
    """Log-hygiene truncation: first 120 chars + ellipsis (reference:
    internal/parse/parse.go:144-149; the Go code slices bytes, but its
    inputs are ASCII log lines where bytes == chars)."""
    return F.when(
        F.length(msg) > max_chars,
        F.concat(F.substring(msg, 1, max_chars), F.lit("…")),
    ).otherwise(msg)
