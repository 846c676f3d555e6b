"""Adversarial-input robustness: the reference's core contract is that
EVERY input line yields exactly one event, never an error
(docs/normalization-spec.md:250-261). The parse layer is built from
ANSI-safe try_* expressions, so malformed payloads must degrade to
plain/empty classification, not exceptions — including under Spark's
default ANSI mode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logshipper_spark import formats, parse

NASTY = [
    "",
    " ",
    "\t\n",
    "{",
    "}",
    "[",
    "[]",
    "{}",
    "[1,2,3]",
    '{"a":}',
    '{"a": "b"',
    '{"a": {"b": {"c": {"d": "e"}}}}',
    '{"metric": "m"}',                       # metric key without value
    '{"metric": "m", "value": "not-a-number"}',
    '{"timestamp": "not a time", "service": "s"}',
    '{"timestamp": 1e308, "service": "s"}',   # absurd epoch
    '{"timestamp": -5, "service": "s"}',
    '{"latency": "12parsecs", "service": "s"}',
    '{"latency": "-1ms", "service": "s"}',
    '{"status": "12.9", "service": "s"}',
    '{"status": "NaN", "service": "s"}',
    '{"level": 42, "service": "s"}',
    '{"@timestamp": 17}',
    '{"log": 5, "stream": true, "time": {}}',  # docker-shaped, wrong types
    "<999>1 bogus",
    "<13>Feb 30 25:61:61 h app: impossible date",
    "ts=== level== =x",
    "a=1 b=2 c=",
    "just text with a { brace",
    "text with suffix {not json}",
    'text with suffix {"k": "v"} trailing',   # json not at end
    "\x00\x01\x02",
    "emoji 🎉 and ünïcødé and ‮ rtl",
    "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 math letters " * 3,
    "x" * 5000,
    '{"' + "k" * 2000 + '": "v"}',
    '{"service": "' + "s" * 3000 + '"}',
    '[{"service": "in-array"}]',
    '"just a json string"',
    "123456",
    "-1.5e10",
    "null",
    "true",
]

KNOWN_FORMATS = {
    "json", "ecs_json", "metric_json", "template", "plain", "empty",
    "syslog_3164", "syslog_5424", "python_logging", "logfmt",
    "plain_json", "docker_json", "prom_text",
}


@pytest.fixture(scope="module", params=["core", "extended"])
def parsed(spark, request):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(NASTY)], "i int, text string")
    fn = parse.parse_normalized if request.param == "core" else formats.parse_extended
    return fn(df, text_col="text", source_name="fuzz").collect()


def test_no_rows_lost_or_duplicated(parsed):
    assert len(parsed) == len(NASTY)
    assert sorted(r["i"] for r in parsed) == list(range(len(NASTY)))


def test_every_row_classified(parsed):
    for r in parsed:
        assert r["format"] in KNOWN_FORMATS, (r["i"], r["format"], r["text"][:50])


def test_fields_are_total(parsed):
    """No nulls in the closed field set; numeric fields sane."""
    for r in parsed:
        for f in ["trace_id", "span_id", "src_service", "dst_service",
                  "operation", "level", "source_name"]:
            assert r[f] is not None, (r["i"], f)
        assert r["event_ts"] is not None
        assert r["status_code"] is not None
        assert r["latency_us"] is not None
        assert r["raw"] is not None or r["format"] in ("plain", "empty"), r["i"]
