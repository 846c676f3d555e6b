"""Extended log-format parsers — the formats the reference *specifies*
but does not implement in code (reference: docs/normalization-spec.md
§5, docs/log_format/detection.md §"future formats"; exercised by its
mixed-format test corpus). All native column expressions, composed on
top of the core dispatcher as a refinement of its ``plain`` fallback
(plus an interception of the docker JSON envelope).

Formats:

* ``syslog_3164``  — ``<PRI>Mon dd HH:MM:SS host tag[pid]: msg``
* ``syslog_5424``  — ``<PRI>1 ISOTS host app pid msgid [SD] msg``
* ``python_logging`` — ``YYYY-mm-dd HH:MM:SS,mmm - name - LEVEL - msg``
* ``logfmt``       — ``ts=... level=... service=... msg=...`` (key=value
  pairs → ``str_to_map`` → the SAME alias-group extractors as JSON)
* ``plain_json``   — free text with a trailing JSON object
* ``docker_json``  — ``{"log": "<inner>", "stream": "...", "time": ...}``
  envelope; the inner line is re-parsed one level (JSON or plain)
* ``prom_text``    — Prometheus exposition samples
  ``metric_name{labels} value [timestamp_ms]`` → metric-style event
  (metric name → operation, like the metric-JSON branch)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import parse
from .schemas import DEFAULT_INGEST_TS, FORMAT_ECS, FORMAT_JSON, FORMAT_PLAIN

FORMAT_SYSLOG_3164 = "syslog_3164"
FORMAT_SYSLOG_5424 = "syslog_5424"
FORMAT_PYTHON_LOGGING = "python_logging"
FORMAT_LOGFMT = "logfmt"
FORMAT_PLAIN_JSON = "plain_json"
FORMAT_DOCKER = "docker_json"

_R3164 = (
    r"^<(\d{1,3})>([A-Z][a-z]{2}\s+\d{1,2}\s\d{2}:\d{2}:\d{2})\s+"
    r"(\S+)\s+([^:\[\s]+)(?:\[(\d+)\])?:\s*(.*)$"
)
# Structured data: '-' or a run of [..] elements with no ']' inside
# (escaped \] in SD param values is not supported — documented limit);
# a greedy \[.*\] would swallow messages that contain ']'. The SD run is
# captured (group 7) so correlation params ride out of it.
_R5424 = (
    r"^<(\d{1,3})>1\s+(\S+)\s+(\S+)\s+(\S+)\s+(\S+)\s+(\S+)\s+"
    r"((?:\[[^\]]*\])+|-)\s*(.*)$"
)
# docs/correlation_fields.md §Trace ID: RFC5424 carries the trace id as
# a structured-data param, e.g. [req traceId="abc123"]
_R5424_TRACE = r'[\[\s](?:traceId|trace_id|trace-id)="([^"]*)"'
_R5424_SPAN = r'[\[\s](?:spanId|span_id|span-id)="([^"]*)"'
_RPY = (
    r"^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}),(\d{3})\s+-\s+(\S+)\s+-\s+"
    r"([A-Z]+)\s+-\s+(.*)$"
)
_RLOGFMT = r"^(?:[A-Za-z_][A-Za-z0-9_.]*=\S*\s*)+$"
_RPLAINJSON = r"^[^{}]+\{.*\}\s*$"
FORMAT_PROM = "prom_text"
_RPROM = (
    r"^([a-zA-Z_:][a-zA-Z0-9_:]*)(\{[^}]*\})?\s+"
    r"([-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?|NaN|[-+]?Inf)(?:\s+(\d+))?$"
)


def severity_level(pri: Column) -> Column:
    """Syslog PRI → level (severity = pri % 8): 0-3 error, 4 warn,
    5-6 info, 7 debug."""
    sev = F.pmod(pri.cast("int"), F.lit(8))
    return (
        F.when(sev <= 3, "error")
        .when(sev == 4, "warn")
        .when(sev <= 6, "info")
        .otherwise("debug")
    )


def _g(text: Column, pattern: str, idx: int) -> Column:
    return F.regexp_extract(text, pattern, idx)


def is_syslog_3164(text: Column) -> Column:
    return text.rlike(_R3164)


def is_syslog_5424(text: Column) -> Column:
    return text.rlike(_R5424)


def is_python_logging(text: Column) -> Column:
    return text.rlike(_RPY)


def is_logfmt(text: Column) -> Column:
    return text.rlike(_RLOGFMT) & text.contains("=")


_SQL_TEXT = "_ext_text"  # working-column name used in SQL snippets


def json_suffix_map(text: Column) -> Column:
    """The trailing-JSON-object part of a mixed line, decoded; NULL when
    absent/invalid."""
    return F.from_json(
        F.substr(text, F.instr(text, F.lit("{"))), "map<string,string>"
    )


def is_plain_json_suffix(text: Column) -> Column:
    return text.rlike(_RPLAINJSON) & json_suffix_map(text).isNotNull()


def is_prom_text(text: Column) -> Column:
    return text.rlike(_RPROM)


def prom_fields(text: Column) -> dict[str, Column]:
    """Exposition sample → metric-style event: name → operation
    (mirroring the metric-JSON branch / helpers.go:124-127); the value,
    labels, and optional millisecond timestamp ride in the raw map."""
    name = _g(text, _RPROM, 1)
    labels = _g(text, _RPROM, 2)
    value = _g(text, _RPROM, 3)
    ts_ms = _g(text, _RPROM, 4).try_cast("long")
    return {
        "operation": name,
        "event_ts": F.when(ts_ms.isNotNull(), F.timestamp_millis(ts_ms)),
        "raw": F.create_map(
            F.lit("metric"), name, F.lit("value"), value, F.lit("labels"), labels
        ),
    }


def syslog_3164_fields(text: Column, ingest_ts: str) -> dict[str, Column]:
    """RFC3164 carries no year: take it from the pinned ingest_ts
    (deterministic; documented delta vs wall-clock implementations)."""
    year = F.date_format(F.lit(ingest_ts).cast("timestamp"), "yyyy")
    # single-digit days are space-padded ("Mar  7") — collapse runs
    ts_part = F.regexp_replace(_g(text, _R3164, 2), r"\s+", " ")
    ts = F.try_to_timestamp(
        F.concat(year, F.lit(" "), ts_part),
        F.lit("yyyy MMM d HH:mm:ss"),
    )
    return {
        "level": severity_level(_g(text, _R3164, 1)),
        "event_ts": ts,
        "src_service": _g(text, _R3164, 4),
        "message": _g(text, _R3164, 6),
        "host": _g(text, _R3164, 3),
        "pid": _g(text, _R3164, 5),
    }


def syslog_5424_fields(text: Column) -> dict[str, Column]:
    nil = lambda c: F.when(c != "-", c).otherwise(F.lit(""))  # noqa: E731
    return {
        "level": severity_level(_g(text, _R5424, 1)),
        "event_ts": F.try_to_timestamp(_g(text, _R5424, 2)),
        "src_service": nil(_g(text, _R5424, 4)),
        "message": _g(text, _R5424, 8),
        "host": nil(_g(text, _R5424, 3)),
        "pid": nil(_g(text, _R5424, 5)),
        "trace_id": F.regexp_extract(_g(text, _R5424, 7), _R5424_TRACE, 1),
        "span_id": F.regexp_extract(_g(text, _R5424, 7), _R5424_SPAN, 1),
    }


def python_logging_fields(text: Column) -> dict[str, Column]:
    ts = F.try_to_timestamp(
        F.concat(_g(text, _RPY, 1), F.lit("."), _g(text, _RPY, 2)),
        F.lit("yyyy-MM-dd HH:mm:ss.SSS"),
    )
    return {
        "level": F.lower(_g(text, _RPY, 4)),
        "event_ts": ts,
        "src_service": _g(text, _RPY, 3),
        "message": _g(text, _RPY, 5),
    }


def logfmt_map(text: Column) -> Column:
    """key=value pairs → map, then the JSON alias-group extractors
    apply unchanged (the whole point of normalizing to a map).

    Keys are deduplicated keeping the LAST occurrence (Go map
    last-write-wins) BEFORE the map is built: under Spark's default
    mapKeyDedupPolicy=EXCEPTION a raw str_to_map would abort the whole
    job on one malformed line like 'level=info level=debug msg=x' — a
    log parser must degrade per-row, not die."""
    toks = F.split(F.trim(text), r"\s+")
    entries = F.transform(
        toks,
        lambda kv: F.struct(
            F.substring_index(kv, "=", 1).alias("key"),
            F.when(
                F.instr(kv, "=") > 0, F.substr(kv, F.instr(kv, F.lit("=")) + 1)
            ).alias("value"),
        ),
    )
    last_wins = F.filter(
        entries,
        lambda e, i: ~F.exists(
            F.slice(entries, i + 2, F.size(entries)),
            lambda later: later["key"] == e["key"],
        ),
    )
    return F.map_from_entries(last_wins)





def parse_extended(
    df: DataFrame,
    text_col: str = "text",
    source_name: Column | str = "spark",
    ingest_ts: str = DEFAULT_INGEST_TS,
) -> DataFrame:
    """Core dispatcher + spec'd formats.

    Runs ``parse.parse_normalized`` first; rows it classifies ``plain``
    are refined through the extended detectors (in spec order:
    syslog 5424 → syslog 3164 → python logging → logfmt → JSON suffix),
    and generic-JSON rows matching the docker envelope are unwrapped
    and their inner line reparsed one level (JSON or plain).
    """
    out = parse.parse_normalized(df, text_col, source_name, ingest_ts)
    out = out.withColumn(_SQL_TEXT, F.trim(F.col(text_col)))
    t = F.col(_SQL_TEXT)
    ingest = F.lit(ingest_ts).cast("timestamp")

    # STAGED detector flags and shared maps: every ext() output column
    # references several of these, and an unstaged expression tree is
    # inlined (and, for regex probes / from_json / HOF maps, evaluated)
    # at every reference — CLAUDE.md round-3 no-CSE gotcha. Staging
    # makes each a single per-row evaluation; CollapseProject keeps
    # multi-referenced non-cheap aliases staged. The maps are gated
    # behind their flag so non-matching rows never build them.
    is_plain = F.col("format") == FORMAT_PLAIN
    out = out.withColumn("_s5424", is_plain & is_syslog_5424(t))
    out = out.withColumn(
        "_s3164", is_plain & ~F.col("_s5424") & is_syslog_3164(t)
    )
    out = out.withColumn(
        "_spy",
        is_plain & ~F.col("_s5424") & ~F.col("_s3164") & is_python_logging(t),
    )
    out = out.withColumn(
        "_slog",
        is_plain
        & ~F.col("_s5424")
        & ~F.col("_s3164")
        & ~F.col("_spy")
        & is_logfmt(t),
    )
    out = out.withColumn(
        "_sprom",
        is_plain
        & ~F.col("_s5424")
        & ~F.col("_s3164")
        & ~F.col("_spy")
        & ~F.col("_slog")
        & is_prom_text(t),
    )
    out = out.withColumn(
        "_sjson",
        is_plain
        & ~F.col("_s5424")
        & ~F.col("_s3164")
        & ~F.col("_spy")
        & ~F.col("_slog")
        & ~F.col("_sprom")
        & is_plain_json_suffix(t),
    )
    # docker envelope: JSON whose map carries log+stream+time. The core
    # dispatcher may have classified it ecs_json (the nested log.level
    # probe fires on an inner JSON line) — intercept both.
    out = out.withColumn(
        "_raw0",
        F.when(
            F.col("format").isin(FORMAT_JSON, FORMAT_ECS),
            F.from_json(t, "map<string,string>"),
        ),
    )
    out = out.withColumn(
        "_docker",
        F.col("format").isin(FORMAT_JSON, FORMAT_ECS)
        & F.map_contains_key(F.col("_raw0"), "log")
        & F.map_contains_key(F.col("_raw0"), "stream")
        & F.map_contains_key(F.col("_raw0"), "time"),
    )
    inner = F.trim(F.try_element_at(F.col("_raw0"), F.lit("log")))
    out = out.withColumn(
        "_inner_raw",
        F.when(
            F.col("_docker") & F.substring(inner, 1, 1).isin("{", "["),
            F.from_json(inner, "map<string,string>"),
        ),
    )
    out = out.withColumn("_lfm", F.when(F.col("_slog"), logfmt_map(t)))
    out = out.withColumn("_jsm", F.when(F.col("_sjson"), json_suffix_map(t)))

    s5424 = F.col("_s5424")
    s3164 = F.col("_s3164")
    spy = F.col("_spy")
    slog = F.col("_slog")
    sprom = F.col("_sprom")
    sjson = F.col("_sjson")
    docker = F.col("_docker")
    raw0 = F.col("_raw0")
    inner_raw = F.col("_inner_raw")
    lfm = F.col("_lfm")
    jsm = F.col("_jsm")

    # STAGED per-format field structs, gated behind their detector
    # flag: a field dict would inline (and re-evaluate) its
    # regexp_extract tree at EVERY ext() reference — the level cascade
    # alone re-extracts each syslog PRI three times, and the fused
    # projection's generated method then grows past Janino's 64 KB
    # hard limit, silently dropping the whole stage to interpreted
    # eval (CLAUDE.md round-3 gotcha; seen in the contract sweep). As
    # one struct per row, each format's regex runs once and the
    # assembly cascade is cheap getFields. Same call-site syntax:
    # Column["field"] is getField, dict["field"] was a lookup.
    # Only fields the assembly cascade actually reads go into the
    # struct: the field builders also derive message/host/pid, which no
    # output column references — the lazy dict form never evaluated
    # them, and materializing them in the struct measured 25% slower.
    _USED = {
        "_f3164": ("level", "event_ts", "src_service"),
        "_f5424": ("level", "event_ts", "src_service", "trace_id", "span_id"),
        "_fpy": ("level", "event_ts", "src_service"),
        "_fprm": ("operation", "raw", "event_ts"),
    }
    for _n, _flag, _fields in (
        ("_f3164", F.col("_s3164"), syslog_3164_fields(t, ingest_ts)),
        ("_f5424", F.col("_s5424"), syslog_5424_fields(t)),
        ("_fpy", F.col("_spy"), python_logging_fields(t)),
        ("_fprm", F.col("_sprom"), prom_fields(t)),
    ):
        out = out.withColumn(
            _n,
            F.when(
                _flag,
                F.struct(*[_fields[k].alias(k) for k in _USED[_n]]),
            ),
        )
    f3164 = F.col("_f3164")
    f5424 = F.col("_f5424")
    fpy = F.col("_fpy")
    prm = F.col("_fprm")

    def ext(name: str) -> Column:
        """Per-field refinement cascade over the detected format."""
        if name == "format":
            return (
                F.when(docker, FORMAT_DOCKER)
                .when(s5424, FORMAT_SYSLOG_5424)
                .when(s3164, FORMAT_SYSLOG_3164)
                .when(spy, FORMAT_PYTHON_LOGGING)
                .when(slog, FORMAT_LOGFMT)
                .when(sprom, FORMAT_PROM)
                .when(sjson, FORMAT_PLAIN_JSON)
                .otherwise(F.col("format"))
            )
        if name == "operation":
            return (
                F.when(sprom, prm["operation"])
                .when(slog, F.coalesce(parse.extract_operation(lfm), F.lit("")))
                .when(sjson, F.coalesce(parse.extract_operation(jsm), F.lit("")))
                .when(docker, F.coalesce(parse.extract_operation(inner_raw), F.lit("")))
                .otherwise(F.col("operation"))
            )
        if name == "raw":
            return F.when(sprom, prm["raw"]).otherwise(F.col("raw"))
        if name == "level":
            return (
                F.when(docker, F.coalesce(parse.extract_level(inner_raw), F.lit("")))
                .when(s5424, f5424["level"])
                .when(s3164, f3164["level"])
                .when(spy, fpy["level"])
                .when(slog, F.coalesce(parse.extract_level(lfm), F.lit("")))
                .when(sjson, F.coalesce(parse.extract_level(jsm), F.lit("")))
                .otherwise(F.col("level"))
            )
        if name == "event_ts":
            docker_ts = F.coalesce(
                parse.extract_timestamp(inner_raw),
                parse._ts_candidate(F.try_element_at(raw0, F.lit("time"))),
                ingest,
            )
            return (
                F.when(docker, docker_ts)
                .when(s5424, F.coalesce(f5424["event_ts"], ingest))
                .when(s3164, F.coalesce(f3164["event_ts"], ingest))
                .when(spy, F.coalesce(fpy["event_ts"], ingest))
                .when(slog, F.coalesce(parse.extract_timestamp(lfm), ingest))
                .when(sprom, F.coalesce(prm["event_ts"], ingest))
                .when(sjson, F.coalesce(parse.extract_timestamp(jsm), ingest))
                .otherwise(F.col("event_ts"))
            )
        if name == "src_service":
            return (
                F.when(docker, F.coalesce(parse.extract_service(inner_raw), F.lit("")))
                .when(s5424, f5424["src_service"])
                .when(s3164, f3164["src_service"])
                .when(spy, fpy["src_service"])
                .when(slog, F.coalesce(parse.extract_service(lfm), F.lit("")))
                .when(sjson, F.coalesce(parse.extract_service(jsm), F.lit("")))
                .otherwise(F.col("src_service"))
            )
        if name == "status_code":
            return (
                F.when(docker, F.coalesce(parse.extract_status_code(inner_raw), F.lit(0)))
                .when(slog, parse.extract_status_code(lfm))
                .when(sjson, parse.extract_status_code(jsm))
                .otherwise(F.col("status_code"))
            )
        if name == "latency_us":
            return (
                F.when(docker, F.coalesce(parse.extract_latency_us(inner_raw), F.lit(0).cast("long")))
                .when(slog, parse.extract_latency_us(lfm))
                .when(sjson, parse.extract_latency_us(jsm))
                .otherwise(F.col("latency_us"))
            )
        if name == "trace_id":
            # correlation fields ride every format that can carry them
            # (docs/correlation_fields.md §Trace ID)
            tr = lambda m: F.coalesce(  # noqa: E731
                parse.first_string(m, parse.TRACE_KEYS), F.lit("")
            )
            return (
                F.when(docker, tr(inner_raw))
                .when(s5424, f5424["trace_id"])
                .when(slog, tr(lfm))
                .when(sjson, tr(jsm))
                .otherwise(F.col("trace_id"))
            )
        if name == "span_id":
            # span rides fewer formats than trace per the spec's span
            # table (correlation_fields.md §Span ID: ECS, generic
            # JSON, 5424 structured-data; Nginx/Python/Docker 'not
            # present by default')
            sp = lambda m: F.coalesce(  # noqa: E731
                parse.first_string(m, parse.SPAN_KEYS), F.lit("")
            )
            return (
                F.when(s5424, f5424["span_id"])
                .when(sjson, sp(jsm))
                .otherwise(F.col("span_id"))
            )
        if name == "dst_service":
            dstx = lambda m: F.coalesce(  # noqa: E731
                parse.first_string(m, parse.DST_KEYS), F.lit("")
            )
            return (
                F.when(docker, dstx(inner_raw))
                .when(slog, dstx(lfm))
                .when(sjson, dstx(jsm))
                .otherwise(F.col("dst_service"))
            )
        raise KeyError(name)

    for name in [
        "level", "event_ts", "src_service", "status_code", "latency_us",
        "operation", "raw", "trace_id", "span_id", "dst_service",
    ]:
        out = out.withColumn(name, ext(name))
    out = out.withColumn("format", ext("format"))
    # prom_text never carries a service name — a successfully refined
    # Prometheus sample is still a parsed row, not a parse error
    out = out.withColumn(
        "parse_ok", (F.col("src_service") != "") | (F.col("format") == FORMAT_PROM)
    )
    return out.drop(
        _SQL_TEXT,
        "_s5424", "_s3164", "_spy", "_slog", "_sprom", "_sjson",
        "_raw0", "_docker", "_inner_raw", "_lfm", "_jsm",
        "_f3164", "_f5424", "_fpy", "_fprm",
    )
