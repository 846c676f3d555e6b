"""Template/grok parser tests (reference: internal/parse/parse_test.go:169-203)."""

from __future__ import annotations

from logshipper_spark.template import TemplateParser, compile_template

NGINX_COMBINED = (
    '$remote_addr - $remote_user [$time_local] "$method $request $protocol" '
    '$status $body_bytes_sent "$http_referer" "$http_user_agent" '
    "$request_time $request_id"
)


def _parse(spark, template, lines):
    p = TemplateParser(template)
    df = spark.createDataFrame([(l,) for l in lines], ["text"])
    out = p.parse_normalized(df, source_name="nginx-file")
    return [r.asDict(recursive=True) for r in out.collect()]


# ── parse_test.go:169-195 nginx combined log ──
def test_nginx_combined(spark):
    line = (
        '192.168.1.42 - john [10/Feb/2024:13:55:36 +0300] "GET /api/users HTTP/1.1" '
        '200 1543 "https://example.com" "Mozilla/5.0" 0.087 a1b2c3d4'
    )
    got = _parse(spark, NGINX_COMBINED, [line])[0]
    assert got["template_matched"] is True
    assert got["status_code"] == 200
    assert got["operation"] == "GET /api/users"
    assert got["latency_us"] == 87_000
    assert got["trace_id"] == "a1b2c3d4"
    assert got["format"] == "template"
    assert got["level"] == "info"  # status→level derivation (template.go:119-128)
    # nginx local time 13:55:36 +0300 → 10:55:36 UTC
    assert str(got["event_ts"]) == "2024-02-10 10:55:36"
    assert got["raw"]["remote_addr"] == "192.168.1.42"
    assert got["raw"]["request"] == "/api/users"


# ── parse_test.go:197-203 no match → nil ──
def test_no_match(spark):
    got = _parse(spark, "$remote_addr [$time_local] $status", ["this does not match at all"])[0]
    assert got["template_matched"] is False
    assert got["format"] is None
    assert got["event_ts"] is None


def test_status_level_derivation(spark):
    tmpl = "$remote_addr [$time_local] $status"
    lines = [
        "1.1.1.1 [10/Feb/2024:13:55:36 +0000] 503",
        "1.1.1.1 [10/Feb/2024:13:55:36 +0000] 404",
        "1.1.1.1 [10/Feb/2024:13:55:36 +0000] 200",
    ]
    rows = _parse(spark, tmpl, lines)
    assert [r["level"] for r in rows] == ["error", "warn", "info"]


def test_request_time_dash_skipped(spark):
    tmpl = "$remote_addr $status $request_time"
    got = _parse(spark, tmpl, ["1.1.1.1 200 -"])[0]
    assert got["template_matched"] is True
    assert got["latency_us"] == 0  # '-' fails float parse → latency unset


def test_compile_template_vars_in_order(spark):
    pattern, vars_ = compile_template("$a - $b [$c]")
    assert vars_ == ["a", "b", "c"]
    assert pattern.startswith("^")
    assert pattern.endswith("$")


def test_induce_templates(spark):
    """Template induction: uuid/ip/hex/number masking (most-specific
    first), grouping, exact distinct counts, lexicographic example,
    (n DESC, template) ordering, NULL messages dropped."""
    from pyspark.sql import functions as F  # noqa: F401

    from logshipper_spark.template import induce_templates, normalize_template

    msgs = [
        "user 17 logged in from 10.0.3.25",
        "user 9 logged in from 10.0.4.200",
        "user 17 logged in from 10.0.3.25",  # exact repeat
        "txn 0xdeadBEEF failed after 2.5s",
        "txn 0x1f failed after 31s",
        "req 123e4567-e89b-12d3-a456-426614174000 ok v2",
        "req 00000000-0000-0000-0000-000000000000 ok v2",
        None,
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "message string")
    got = [
        (r["template"], r["n"], r["n_distinct"], r["example"])
        for r in induce_templates(df, k=10).collect()
    ]
    assert got == [
        ("user <num> logged in from <ip>", 3, 2,
         "user 17 logged in from 10.0.3.25"),
        ("req <uuid> ok v2", 2, 2,
         "req 00000000-0000-0000-0000-000000000000 ok v2"),
        ("txn <hex> failed after <num>s", 2, 2,
         "txn 0x1f failed after 31s"),
    ]
    # unit-suffixed decimals and integers share one template
    # masking order: a uuid's hex runs must not half-mask
    row = spark.createDataFrame(
        [("id 123e4567-e89b-12d3-a456-426614174000 x 0xab 7 1.2.3.4",)],
        "message string",
    ).select(normalize_template(F.col("message")).alias("t")).head()
    assert row["t"] == "id <uuid> x <hex> <num> <ip>"
