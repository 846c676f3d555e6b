"""Extended (spec-only) formats: syslog, python logging, logfmt,
plain+JSON suffix, docker envelope."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from logshipper_spark import formats

INGEST = "2024-01-01 00:00:00"


def _parse_lines(spark, lines):
    df = spark.createDataFrame([(l,) for l in lines], "text string")
    out = formats.parse_extended(df, text_col="text", source_name="t", ingest_ts=INGEST)
    return {r["text"]: r.asDict() for r in out.collect()}


@pytest.fixture(scope="module")
def parsed(spark):
    lines = [
        "<34>Oct 11 22:14:15 myhost su[123]: auth failure for root",
        "<165>Mar  7 09:00:01 web01 nginx: started",
        '<165>1 2024-03-01T10:30:00.123Z web01 payments 77 ID47 - checkout slow',
        "2024-03-01 12:00:00,250 - billing.worker - WARNING - retrying invoice",
        "ts=2024-03-01T08:00:00Z level=ERROR service=auth latency=87ms status=500 msg=denied",
        'request failed for user 42 {"service":"cart","level":"warn","duration_ms":12}',
        '{"log":"{\\"service\\":\\"inner-svc\\",\\"level\\":\\"info\\",\\"latency_ms\\":5}","stream":"stdout","time":"2024-03-01T01:02:03Z"}',
        '{"log":"plain container line","stream":"stderr","time":1709250000}',
        "just some plain text",
    ]
    return _parse_lines(spark, lines)


def test_syslog_3164(parsed):
    r = parsed["<34>Oct 11 22:14:15 myhost su[123]: auth failure for root"]
    assert r["format"] == "syslog_3164"
    assert r["level"] == "error"  # 34 % 8 == 2 → crit bucket
    assert r["src_service"] == "su"
    assert r["event_ts"] == datetime.datetime(2024, 10, 11, 22, 14, 15)

    r2 = parsed["<165>Mar  7 09:00:01 web01 nginx: started"]
    assert r2["format"] == "syslog_3164"
    assert r2["level"] == "info"  # 165 % 8 == 5
    assert r2["src_service"] == "nginx"
    assert r2["event_ts"] == datetime.datetime(2024, 3, 7, 9, 0, 1)


def test_syslog_5424(parsed):
    r = parsed['<165>1 2024-03-01T10:30:00.123Z web01 payments 77 ID47 - checkout slow']
    assert r["format"] == "syslog_5424"
    assert r["src_service"] == "payments"
    assert r["level"] == "info"
    assert r["event_ts"] == datetime.datetime(2024, 3, 1, 10, 30, 0, 123000)


def test_python_logging(parsed):
    r = parsed["2024-03-01 12:00:00,250 - billing.worker - WARNING - retrying invoice"]
    assert r["format"] == "python_logging"
    assert r["src_service"] == "billing.worker"
    assert r["level"] == "warning"
    assert r["event_ts"] == datetime.datetime(2024, 3, 1, 12, 0, 0, 250000)


def test_logfmt(parsed):
    r = parsed[
        "ts=2024-03-01T08:00:00Z level=ERROR service=auth latency=87ms status=500 msg=denied"
    ]
    assert r["format"] == "logfmt"
    assert r["src_service"] == "auth"
    assert r["level"] == "error"
    assert r["status_code"] == 500
    assert r["latency_us"] == 87_000
    assert r["event_ts"] == datetime.datetime(2024, 3, 1, 8, 0, 0)


def test_plain_json_suffix(parsed):
    r = parsed['request failed for user 42 {"service":"cart","level":"warn","duration_ms":12}']
    assert r["format"] == "plain_json"
    assert r["src_service"] == "cart"
    assert r["level"] == "warn"
    assert r["latency_us"] == 12_000


def test_docker_envelope_inner_json(parsed):
    key = '{"log":"{\\"service\\":\\"inner-svc\\",\\"level\\":\\"info\\",\\"latency_ms\\":5}","stream":"stdout","time":"2024-03-01T01:02:03Z"}'
    r = parsed[key]
    assert r["format"] == "docker_json"
    assert r["src_service"] == "inner-svc"
    assert r["latency_us"] == 5_000


def test_docker_envelope_inner_plain(parsed):
    r = parsed['{"log":"plain container line","stream":"stderr","time":1709250000}']
    assert r["format"] == "docker_json"
    assert r["src_service"] == ""
    # envelope time (unix seconds) becomes the event time
    assert r["event_ts"] == datetime.datetime(2024, 2, 29, 23, 40, 0)


def test_plain_unchanged(parsed):
    r = parsed["just some plain text"]
    assert r["format"] == "plain"
    assert r["event_ts"] == datetime.datetime(2024, 1, 1, 0, 0, 0)


def test_5424_structured_data_trace_id(spark):
    """docs/correlation_fields.md: RFC5424 trace id rides a
    structured-data param; message stays intact."""
    out = _parse_lines(spark, [
        '<165>1 2024-03-01T10:30:00Z web01 pay 7 ID [req traceId="abc123" x="1"] checkout ok',
        "<165>1 2024-03-01T10:30:00Z web01 pay 7 ID - no sd here",
    ])
    r = out['<165>1 2024-03-01T10:30:00Z web01 pay 7 ID [req traceId="abc123" x="1"] checkout ok']
    assert r["format"] == "syslog_5424"
    assert r["trace_id"] == "abc123"
    r2 = out["<165>1 2024-03-01T10:30:00Z web01 pay 7 ID - no sd here"]
    assert r2["trace_id"] == ""


def test_logfmt_and_json_suffix_correlation_fields(spark):
    out = _parse_lines(spark, [
        "level=info service=a dst_service=b trace_id=t-9 msg=hi",
        'tail text {"service":"c","upstream":"d","traceId":"t-7"}',
    ])
    r = out["level=info service=a dst_service=b trace_id=t-9 msg=hi"]
    assert (r["trace_id"], r["dst_service"]) == ("t-9", "b")
    r2 = out['tail text {"service":"c","upstream":"d","traceId":"t-7"}']
    assert (r2["trace_id"], r2["dst_service"]) == ("t-7", "d")


def test_span_id_rides_5424_sd_and_json_suffix(spark):
    """docs/correlation_fields.md §Span ID: span rides ECS, generic
    JSON, and 5424 structured-data — NOT docker/python/nginx (the
    spec's span table lists those as 'not present by default')."""
    out = _parse_lines(spark, [
        '<165>1 2024-03-01T10:30:00Z web01 pay 7 ID [req traceId="abc123" spanId="sp-1"] ok',
        'tail text {"service":"c","spanId":"sp-2"}',
        "level=info service=a span_id=sp-3 msg=hi",
    ])
    r = out['<165>1 2024-03-01T10:30:00Z web01 pay 7 ID [req traceId="abc123" spanId="sp-1"] ok']
    assert (r["trace_id"], r["span_id"]) == ("abc123", "sp-1")
    r2 = out['tail text {"service":"c","spanId":"sp-2"}']
    assert r2["span_id"] == "sp-2"
    # logfmt is NOT in the spec's span table — stays blank
    r3 = out["level=info service=a span_id=sp-3 msg=hi"]
    assert r3["span_id"] == ""


def test_logfmt_duplicate_key_last_wins(spark):
    """A repeated key must not abort the job (Go maps are
    last-write-wins). The session deliberately keeps the EXCEPTION
    mapKeyDedupPolicy default — logfmt_map dedups keys itself, keeping
    the last occurrence, before map construction."""
    out = _parse_lines(
        spark, ["level=info level=debug service=auth msg=x", "just plain"]
    )
    r = out["level=info level=debug service=auth msg=x"]
    assert r["format"] == "logfmt"
    assert r["level"] == "debug"  # last occurrence wins
    assert r["src_service"] == "auth"


def test_prom_rows_are_parse_ok(spark):
    """Refined Prometheus samples carry no service name but are parsed
    rows, not parse errors."""
    out = _parse_lines(spark, ["up 1", "plain line here"])
    assert out["up 1"]["parse_ok"] is True
    assert out["plain line here"]["parse_ok"] is False


def test_extended_parser_survives_adversarial_lines(spark):
    """A log parser degrades per-row, never dies: garbage, truncated
    structures, control bytes, huge lines, and almost-format lines all
    come back as rows (mostly plain, parse_ok=False)."""
    nasty = [
        "<999>1 not-a-ts h a p m - x",            # invalid pri/ts 5424-shaped
        "<34>Oct 99 99:99:99 h t: x",              # impossible 3164 timestamp
        "level=info level= ==weird = broken",      # malformed logfmt-ish
        "a=" + "b" * 100_000,                      # enormous logfmt value
        '{"log": 42, "stream": true, "time": {}}', # docker keys, wrong types
        "prefix {broken json",                     # JSON suffix that isn't
        "\x00\x01\x02 binary junk \xff",
        "metric_name{unclosed=\"label 12.5",       # almost-prometheus
        "",
    ]
    df = spark.createDataFrame([(l,) for l in nasty], "text string")
    out = formats.parse_extended(df, text_col="text", source_name="t", ingest_ts=INGEST)
    rows = out.collect()  # must not raise
    assert len(rows) == len(nasty)
    for r in rows:
        assert r["format"] is not None
        assert r["event_ts"] is not None  # always at least the ingest ts


def test_prometheus_exposition(spark):
    lines = [
        'http_requests_total{method="post",code="200"} 1027 1395066363000',
        "cpu_seconds 12345.6",
        "up 1",
    ]
    out = _parse_lines(spark, lines)
    r = out['http_requests_total{method="post",code="200"} 1027 1395066363000']
    assert r["format"] == "prom_text"
    assert r["operation"] == "http_requests_total"
    assert r["raw"]["value"] == "1027"
    assert r["raw"]["labels"] == '{method="post",code="200"}'
    assert r["event_ts"] == datetime.datetime(2014, 3, 17, 14, 26, 3)
    r2 = out["cpu_seconds 12345.6"]
    assert r2["format"] == "prom_text"
    assert r2["operation"] == "cpu_seconds"
    assert r2["event_ts"] == datetime.datetime(2024, 1, 1, 0, 0, 0)  # ingest
    assert out["up 1"]["format"] == "prom_text"
