"""Config loader/validator tests (reference: internal/config/load.go,
validate.go — every validation error the reference can produce, plus env
expansion with Go os.ExpandEnv semantics)."""

from __future__ import annotations

import os

import pytest

from logshipper_spark import config as cfgmod
from logshipper_spark.config import (
    Config, ConfigError, SinkConfig, SourceConfig, TransformConfig,
    expand_env, from_dict, load_config,
)

VALID_YAML = """
sources:
  gen_main:
    type: "generate"
    n_turns: 500
transforms:
  add_metadata:
    type: "remap-lite"
    inputs: ["gen_main"]
    add_fields:
      env: "${APP_ENV}"
sinks:
  errors:
    type: "parquet"
    inputs: ["add_metadata"]
    filter: "level = 'error' OR status_code >= 500"
  everything:
    type: "parquet"
    inputs: ["add_metadata"]
resolve:
  static:
    "db.internal": "postgres"
    "*.redis.svc": "redis"
  docker: true
anomaly:
  window_size: 50
  threshold: 2.5
"""


def _cfg(**kw) -> Config:
    base = dict(
        sources={"s": SourceConfig(type="generate", n_turns=10)},
        sinks={"k": SinkConfig(inputs=["s"])},
    )
    base.update(kw)
    return Config(**base)


# ── load.go:17 env expansion: unset vars expand to "" (Go semantics) ──
def test_expand_env_set_and_unset():
    os.environ["CFGTEST_X"] = "hello"
    try:
        assert expand_env("a=${CFGTEST_X} b=$CFGTEST_X") == "a=hello b=hello"
        assert expand_env("gone=${CFGTEST_NOPE_UNSET}!") == "gone=!"
    finally:
        del os.environ["CFGTEST_X"]


# ── validate.go:6-8 / 10-12 ──
def test_no_sources():
    with pytest.raises(ConfigError, match="at least one source is required"):
        _cfg(sources={}).validate()


def test_no_sinks():
    with pytest.raises(ConfigError, match="at least one sink is required"):
        _cfg(sinks={}).validate()


# ── validate.go:14-23 transform inputs ──
def test_transform_empty_inputs():
    c = _cfg(transforms={"t": TransformConfig(inputs=[])})
    with pytest.raises(ConfigError, match=r"transform \[t\]: inputs list is empty"):
        c.validate()


def test_transform_unknown_input():
    c = _cfg(transforms={"t": TransformConfig(inputs=["ghost"])})
    with pytest.raises(
        ConfigError, match=r"transform \[t\]: refers to unknown input 'ghost'"
    ):
        c.validate()


# ── validate.go:25-34 sink inputs ──
def test_sink_empty_inputs():
    c = _cfg(sinks={"k": SinkConfig(inputs=[])})
    with pytest.raises(ConfigError, match=r"sink \[k\]: inputs list is empty"):
        c.validate()


def test_sink_unknown_input():
    c = _cfg(sinks={"k": SinkConfig(inputs=["ghost"])})
    with pytest.raises(ConfigError, match=r"sink \[k\]: refers to unknown input 'ghost'"):
        c.validate()


# ── validate.go:37-41 a transform is a valid input ──
def test_sink_can_input_transform():
    c = _cfg(
        transforms={"t": TransformConfig(inputs=["s"])},
        sinks={"k": SinkConfig(inputs=["t"])},
    )
    c.validate()  # no raise


def test_load_and_compile(tmp_path):
    os.environ["APP_ENV"] = "prod"
    try:
        p = tmp_path / "cfg.yml"
        p.write_text(VALID_YAML)
        cfg = load_config(str(p))
    finally:
        del os.environ["APP_ENV"]
    assert cfg.sources["gen_main"].n_turns == 500
    assert cfg.transforms["add_metadata"].add_fields == {"env": "prod"}
    compiled = cfgmod.compile_pipeline(cfg)
    assert compiled["docker_replicas"] is True
    assert compiled["anomaly"]["window_size"] == 50
    assert ("db.internal", "postgres", False, 0) in compiled["host_rows"]
    assert ("*.redis.svc", "redis", True, 1) in compiled["host_rows"]
    rules = dict((name, pred) for name, pred, _ in compiled["rules"])
    assert rules["errors"].startswith("(level = 'error'")
    assert "source_component IN ('gen_main')" in rules["errors"]
    assert rules["everything"].startswith("(true)")


def test_load_invalid_yaml_fails_validation(tmp_path):
    p = tmp_path / "bad.yml"
    p.write_text("sources:\n  a:\n    type: generate\n")  # no sinks
    with pytest.raises(ConfigError, match="at least one sink"):
        load_config(str(p))


def test_run_from_config_end_to_end(spark, tmp_path):
    p = tmp_path / "cfg.yml"
    p.write_text(VALID_YAML)
    os.environ["APP_ENV"] = "prod"
    try:
        cfg = load_config(str(p))
    finally:
        del os.environ["APP_ENV"]
    out = tmp_path / "out"
    summary = cfgmod.run_from_config(spark, cfg, str(out), run_id="cfgtest")
    assert summary["rows_in"] == 500
    assert set(summary["sink_rows"]) == {"errors", "everything"}
    assert summary["sink_rows"]["everything"] == 500
    assert 0 < summary["sink_rows"]["errors"] < 500
    # sinks landed on disk (default single-pass layout, hive sink= dirs)
    assert (out / "sinks_by" / "batch_id=0" / "sink=errors").exists()
    # add_fields landed in the raw map
    rows = spark.read.parquet(str(out / "sinks_by" / "batch_id=0")).filter(
        "sink = 'everything'"
    )
    assert rows.limit(1).select("raw").first()["raw"].get("env") == "prod"


def test_explicit_priority_zero_is_honored():
    cfg = _cfg(
        sinks={
            "archive": SinkConfig(inputs=["s"], priority=2),
            "alerts": SinkConfig(inputs=["s"], priority=0),
            "rest": SinkConfig(inputs=["s"]),  # unset → after explicit ones
        }
    )
    order = [name for name, _, _ in cfgmod.compile_pipeline(cfg)["rules"]]
    assert order == ["alerts", "archive", "rest"]


def test_inputs_wiring_routes_by_lineage(spark, tmp_path):
    """The reference's inputs edges: a sink consumes only rows that
    flowed from its (transitive) input sources, and a transform's remap
    touches only its own inputs' rows."""
    yaml_text = """
sources:
  gen_a:
    type: "generate"
    n_turns: 200
  gen_b:
    type: "generate"
    n_turns: 200
transforms:
  tag_a:
    inputs: ["gen_a"]
    add_fields: {via: "a-path"}
sinks:
  only_a:
    inputs: ["tag_a"]
  everything:
    inputs: ["tag_a", "gen_b"]
"""
    p = tmp_path / "w.yml"
    p.write_text(yaml_text)
    cfg = load_config(str(p))
    out = tmp_path / "out"
    summary = cfgmod.run_from_config(spark, cfg, str(out), run_id="wire")
    # gen_a and gen_b generate identical 200-turn tables; lineage splits them
    assert summary["sink_rows"]["only_a"] == 200
    assert summary["sink_rows"]["everything"] == 400
    rows = spark.read.parquet(str(out / "sinks_by" / "batch_id=0"))
    a_rows = rows.filter("sink = 'only_a'")
    assert a_rows.filter("source_component <> 'gen_a'").count() == 0
    # transform applied only to gen_a lineage
    tagged = rows.filter("sink = 'everything'").select("source_component", "raw").collect()
    for r in tagged:
        if r["source_component"] == "gen_a":
            assert r["raw"].get("via") == "a-path"
        else:
            assert "via" not in (r["raw"] or {})


def test_file_source_is_deterministic(spark, tmp_path):
    lines = tmp_path / "app.log"
    lines.write_text("\n".join(f"plain line {i}" for i in range(50)) + "\n")
    sc = SourceConfig(type="file", path=str(lines), service="app")
    a = cfgmod.build_source(spark, "f", sc).collect()
    b = cfgmod.build_source(spark, "f", sc).collect()
    assert a == b
    idxs = sorted(r["turn_idx"] for r in a)
    assert idxs == list(range(50))  # contiguous, no per-partition restart


def test_unknown_source_type_raises(spark):
    c = _cfg(sources={"s": SourceConfig(type="wat")})
    with pytest.raises(ConfigError, match=r"source \[s\]: unknown type 'wat'"):
        cfgmod.build_source(spark, "s", c.sources["s"])


# ── Go getShellName parity: shell-special single-char vars ──
def test_expand_env_shell_specials():
    # $$ / $1 / $* consume one char and expand to the (unset) special
    # var — os.ExpandEnv("$1abc") == "abc"
    assert expand_env("cost: $$5") == "cost: 5"
    assert expand_env("$1abc") == "abc"
    assert expand_env("glob $* done") == "glob  done"
    # bare $ before a non-name char stays verbatim, as in Go
    assert expand_env("100$ flat") == "100$ flat"
    assert expand_env("end$") == "end$"
    # brace-wrapped shell specials: Go's getShellName special-cases
    # "${" + special + "}" — os.ExpandEnv("${*}x") == "x"
    assert expand_env("${*}x") == "x"
    assert expand_env("a${?}b${$}c") == "abc"
    assert expand_env("${5}z") == "z"  # brace digit = env var "5", unset


# ── transform input cycles raise ConfigError, not RecursionError ──
def test_transform_input_cycle_raises():
    from logshipper_spark.config import component_sources

    c = _cfg(
        transforms={
            "t1": TransformConfig(inputs=["t2"]),
            "t2": TransformConfig(inputs=["t1"]),
        },
        sinks={"k": SinkConfig(inputs=["t1"])},
    )
    c.validate()  # transforms are legal inputs — validate alone passes
    with pytest.raises(ConfigError, match="cycle"):
        component_sources(c, "t1")


def test_transform_self_cycle_raises():
    from logshipper_spark.config import component_sources

    c = _cfg(
        transforms={"t": TransformConfig(inputs=["t"])},
        sinks={"k": SinkConfig(inputs=["t"])},
    )
    with pytest.raises(ConfigError, match="cycle"):
        component_sources(c, "t")
