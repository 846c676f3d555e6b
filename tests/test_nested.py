"""Nested-JSON flattening layer tests (reference:
docs/normalization-spec.md:91 top-level depth-5 flatten, :355-385
JSON-inside-a-string merge at depth 3 with Message cleared, :250-291
_parse_warn array)."""

from __future__ import annotations

from datetime import datetime

from logshipper_spark.nested import parse_nested


def _run(spark, lines: list[str]):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(lines)], "id int, text string"
    )
    rows = (
        parse_nested(df)
        .select("id", "event_ts", "level", "service", "message", "attrs", "parse_warn")
        .orderBy("id")
        .collect()
    )
    return [r.asDict() for r in rows]


def test_top_level_flatten_depth5_cap(spark):
    [r] = _run(spark, [
        '{"timestamp":"2024-03-15T12:34:56.789Z","level":"INFO","service":"api",'
        '"a":{"b":{"c":{"d":{"e":{"f":"deep"}}}}},"k":"v","message":"hello"}'
    ])
    assert r["event_ts"] == datetime(2024, 3, 15, 12, 34, 56, 789000)
    assert (r["level"], r["service"], r["message"]) == ("info", "api", "hello")
    # 5-segment key holds the level-6 remainder as raw JSON
    assert r["attrs"] == {"a.b.c.d.e": '{"f":"deep"}', "k": "v"}


def test_message_json_string_merged_depth3_and_cleared(spark):
    [r] = _run(spark, [
        '{"msg":"{\\"trace_id\\":\\"abc\\",\\"u\\":{\\"id\\":42,'
        '\\"deep\\":{\\"x\\":{\\"y\\":1}}}}","severity":"warn"}'
    ])
    assert r["message"] == ""  # spec §5.4 step 4
    assert r["level"] == "warn"
    assert r["attrs"] == {
        "msg.trace_id": "abc",
        "msg.u.id": "42",          # numbers stringified
        "msg.u.deep.x": '{"y":1}',  # depth-3 cap inside the string
    }


def test_json_in_string_not_merged_outside_scope(spark):
    """A non-message key whose STRING value contains JSON stays a
    string (spec §5.4 scope: message/msg/log/body only) — the variant
    decode distinguishes it from a real nested object."""
    [r] = _run(spark, ['{"payload":"{\\"x\\": 5}","obj":{"x":"5"}}'])
    assert r["attrs"] == {"payload": '{"x": 5}', "obj.x": "5"}


def test_parse_warnings(spark):
    [r] = _run(spark, [
        '{"ts":"yesterday","http":{"response":{"status_code":"OK"}},"body":"b"}'
    ])
    assert r["parse_warn"] == [
        "timestamp parse failed: 'yesterday'",
        "int coercion failed: http.response.status_code = 'OK'",
    ]
    assert r["event_ts"] == datetime(2024, 1, 1)  # pinned ingest_ts
    assert r["message"] == "b"  # body resolves Message
    assert r["attrs"]["http.response.status_code"] == "OK"


def test_duplicate_flattened_keys_first_win(spark):
    [r] = _run(spark, ['{"dup.k":"top","dup":{"k":"nested"}}'])
    assert r["attrs"] == {"dup.k": "top"}


def test_adversarial_lines(spark):
    rows = _run(spark, [
        "plain line",                      # non-JSON: message passthrough
        '{"message":"[1,2,3]"}',           # array-in-string: verbatim, not cleared
        '{"message":"{not json"}',         # invalid JSON in string: kept
        '{"log":"{\\"a\\":1}","message":"keep"}',  # log merges, message stays
        '{"e":{},"b":true,"f":1.5,"z":null}',      # empty obj vanishes; scalars stringify
    ])
    assert rows[0]["message"] == "plain line" and rows[0]["attrs"] == {}
    assert rows[1]["message"] == "[1,2,3]" and rows[1]["attrs"] == {}
    assert rows[2]["message"] == "{not json" and rows[2]["attrs"] == {}
    assert rows[3]["message"] == "keep" and rows[3]["attrs"] == {"log.a": "1"}
    assert rows[4]["attrs"] == {"b": "true", "f": "1.5", "z": None}
    assert rows[4]["message"] == ""


def test_alias_first_match_wins_and_losers_stay(spark):
    [r] = _run(spark, [
        '{"time":"2024-03-15T00:00:00Z","datetime":"x","level":"A","lvl":"B",'
        '"service":"s1","app":"s2"}'
    ])
    assert r["level"] == "a" and r["service"] == "s1"
    # losing alias keys are NOT consumed — they stay in attrs
    assert r["attrs"] == {"datetime": "x", "lvl": "B", "app": "s2"}
