"""Parse-layer unit tests, ported row-for-row from the reference's
table-driven cases (reference: internal/parse/parse_test.go)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from logshipper_spark.parse import normalized_select, parse_normalized


def _parse_lines(spark, lines, source="test"):
    df = spark.createDataFrame([(l,) for l in lines], ["text"])
    out = parse_normalized(df, text_col="text", source_name=source)
    return [r.asDict(recursive=True) for r in out.collect()]


def _parse_one(spark, payload, source="test"):
    line = json.dumps(payload) if isinstance(payload, dict) else payload
    return _parse_lines(spark, [line], source)[0]


# ── parse_test.go:13-33 TraceID alias groups ──
def test_trace_id_aliases(spark):
    cases = [
        ({"trace_id": "abc123", "service": "svc"}, "abc123"),
        ({"traceId": "def456", "service": "svc"}, "def456"),
        ({"X-Trace-Id": "ghi789", "service": "svc"}, "ghi789"),
        ({"service": "svc"}, ""),
    ]
    for payload, want in cases:
        assert _parse_one(spark, payload)["trace_id"] == want


# ── parse_test.go:35-56 latency unit coercion ──
def test_latency_units(spark):
    cases = [
        ({"duration_ms": 145.0}, 145_000),
        ({"latency": "87ms"}, 87_000),
        ({"response_time": "0.234s"}, 234_000),
        ({"elapsed": "500µs"}, 500),
        ({"duration": 200.0}, 200_000),
    ]
    for payload, want_us in cases:
        got = _parse_one(spark, payload)
        assert got["latency_us"] == want_us, (payload, got["latency_us"])


# ── parse_test.go:58-75 status code coercion ──
def test_status_code(spark):
    cases = [
        ({"status_code": 200}, 200),
        ({"status": 404}, 404),
        ({"http.status": 500}, 500),
        ({"status": "201"}, 201),
    ]
    for payload, want in cases:
        assert _parse_one(spark, payload)["status_code"] == want


def test_scientific_notation_numbers(spark):
    """Scientific-notation JSON numbers reach from_json's
    map<string,string> as their lexeme ("2e2"); the reference's
    json.Unmarshal float64 path accepts them (truncating to int), so
    the numeric gates must too — raw lines, not json.dumps, to pin the
    exponent spelling on the wire."""
    cases = [
        ('{"status": 2e2}', "status_code", 200),
        ('{"status_code": 1.99e2}', "status_code", 199),
        ('{"duration_ms": 1.45e2}', "latency_us", 145_000),
        ('{"latency": 5e2}', "latency_us", 500_000),  # bare number → ms
        ('{"latency_s": 1.5e0}', "latency_us", 1_500_000),  # *_s key → s
    ]
    for line, field, want in cases:
        got = _parse_one(spark, line)
        assert got[field] == want, (line, field, got[field])
    ts = _parse_one(spark, '{"timestamp": 1.7e9, "service": "s"}')
    assert str(ts["event_ts"]) == "2023-11-14 22:13:20"
    ts_ms = _parse_one(spark, '{"timestamp": 1.700000000123e12, "service": "s"}')
    assert str(ts_ms["event_ts"]) == "2023-11-14 22:13:20.123000"


# ── parse_test.go:77-97 operation synthesis ──
def test_operation_synthesis(spark):
    cases = [
        ({"operation": "UserService.GetUser"}, "UserService.GetUser"),
        ({"method": "GET", "url": "/api/users"}, "GET /api/users"),
        ({"rpc.method": "SayHello"}, "SayHello"),
        ({"path": "/health"}, "/health"),
    ]
    for payload, want in cases:
        assert _parse_one(spark, payload)["operation"] == want


# ── parse_test.go:99-115 dst-service aliases ──
def test_dst_service(spark):
    cases = [
        ({"upstream": "user-db"}, "user-db"),
        ({"remote_service": "stripe"}, "stripe"),
        ({"peer.service": "redis"}, "redis"),
    ]
    for payload, want in cases:
        assert _parse_one(spark, payload)["dst_service"] == want


# ── parse_test.go:119-165 full ECS event ──
def test_ecs_full_event(spark):
    payload = {
        "@timestamp": "2024-02-10T13:55:36.123Z",
        "message": "POST /login responded 401",
        "log": {"level": "warn"},
        "service": {"name": "api-gateway"},
        "trace": {"id": "4bf92f3577b34da6a3ce929d0e0e4736"},
        "span": {"id": "00f067aa0ba902b7"},
        "http": {"request": {"method": "POST"}, "response": {"status_code": 401}},
        "url": {"path": "/api/v2/auth/login"},
        "event": {"duration": 234_000_000},
        "destination": {"address": "auth-service"},
    }
    got = _parse_one(spark, payload, source="test-source")
    assert got["format"] == "ecs_json"
    assert got["src_service"] == "api-gateway"
    assert got["trace_id"] == "4bf92f3577b34da6a3ce929d0e0e4736"
    assert got["span_id"] == "00f067aa0ba902b7"
    assert got["status_code"] == 401
    assert got["latency_us"] == 234_000
    assert got["operation"] == "POST /api/v2/auth/login"
    assert got["dst_service"] == "auth-service"
    assert got["level"] == "warn"
    assert str(got["event_ts"]) == "2024-02-10 13:55:36.123000"


# ── parse_test.go:260-296 dispatcher routing ──
def test_format_dispatch(spark):
    cases = [
        (
            '{"@timestamp":"2024-01-01T00:00:00Z","log":{"level":"info"},"service":{"name":"svc"}}',
            "ecs_json",
        ),
        (
            '{"timestamp":"2024-01-01T00:00:00Z","level":"info","service":"svc","message":"hello"}',
            "json",
        ),
        ("just a plain text log line", "plain"),
        ("", "empty"),
        ('{"metric":"cpu_usage","value":0.93,"service":"node"}', "metric_json"),
        ("[1,2,3]", "plain"),  # top-level array fails the map unmarshal
        ('{"broken": ', "plain"),  # invalid JSON falls back to plain
    ]
    got = _parse_lines(spark, [c[0] for c in cases])
    for (line, want), row in zip(cases, got):
        assert row["format"] == want, (line, row["format"])


def test_metric_event_fields(spark):
    got = _parse_one(
        spark,
        {"metric": "cpu_usage", "value": 0.93, "service": "node-7", "timestamp": 1700000000},
    )
    assert got["format"] == "metric_json"
    assert got["operation"] == "cpu_usage"  # metric name → Operation (helpers.go:124-127)
    assert got["src_service"] == "node-7"
    assert str(got["event_ts"]) == "2023-11-14 22:13:20"


def test_plain_and_empty_raw(spark):
    rows = _parse_lines(spark, ["hello world", "   "])
    assert rows[0]["raw"] == {"message": "hello world"}
    assert rows[0]["parse_ok"] is False  # plain has no src_service
    assert rows[1]["format"] == "empty"
    assert rows[1]["raw"] == {}


def test_timestamp_layouts(spark):
    cases = [
        ({"ts": "2024-02-10T13:55:36.123456789Z", "service": "s"}, "2024-02-10 13:55:36.123456"),
        ({"time": "2024-02-10T13:55:36+03:00", "service": "s"}, "2024-02-10 10:55:36"),
        ({"@timestamp": "2024-02-10 13:55:36", "service": "s"}, "2024-02-10 13:55:36"),
        ({"timestamp": 1700000000, "service": "s"}, "2023-11-14 22:13:20"),
        ({"timestamp": 1700000000123, "service": "s"}, "2023-11-14 22:13:20.123000"),
        # unparseable → pinned ingest_ts fallback (determinism policy)
        ({"ts": "not-a-time", "service": "s"}, "2024-01-01 00:00:00"),
        ({"service": "s"}, "2024-01-01 00:00:00"),
    ]
    for payload, want in cases:
        got = _parse_one(spark, payload)
        assert str(got["event_ts"]) == want, (payload, str(got["event_ts"]))


def test_level_lowering_and_service_aliases(spark):
    got = _parse_one(spark, {"severity": "WARN", "app": "billing"})
    assert got["level"] == "warn"
    assert got["src_service"] == "billing"


def test_nothing_dropped(spark):
    lines = ["", "plain", '{"a":1}', '{"metric":"m","value":1}', "[]", '{"broken"']
    df = spark.createDataFrame([(l,) for l in lines], ["text"])
    out = parse_normalized(df)
    assert out.count() == len(lines)  # normalization-spec.md:250-261


def test_normalized_select_schema(spark):
    df = spark.createDataFrame([('{"service":"s"}',)], ["text"])
    out = normalized_select(parse_normalized(df))
    assert out.columns == [
        "trace_id", "span_id", "event_ts", "src_service", "dst_service",
        "operation", "status_code", "latency_us", "level", "format",
        "source_name", "raw",
    ]


def test_raw_preserves_unknown_fields(spark):
    got = _parse_one(spark, {"service": "s", "custom_field": "xyz", "n": 42})
    assert got["raw"]["custom_field"] == "xyz"
    assert got["raw"]["n"] == "42"
