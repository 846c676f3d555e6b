"""Generator tests: determinism, schema, distribution sanity."""

from __future__ import annotations

import json

from logshipper_spark import gen


def test_work_targeted_partitions():
    """Reproduces the measured optima at both A/B calibration points
    and clamps to [1x, 3x] cores (see session.py docstring)."""
    from logshipper_spark.session import work_targeted_partitions as wtp

    assert wtp(600_000, cores=32) == 32     # 1/core: tiny tasks
    assert wtp(9_600_000, cores=16) == 48   # 3/core: real per-task work
    assert wtp(9_600_000, cores=4) == 12
    assert wtp(100, cores=8) == 8           # never below 1/core
    assert wtp(10**9, cores=8) == 24        # never above 3/core


def test_schema_and_determinism(spark):
    df1 = gen.transcripts(spark, 2000)
    df2 = gen.transcripts(spark, 2000)
    assert df1.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    rows1 = sorted(map(tuple, df1.collect()))
    rows2 = sorted(map(tuple, df2.collect()))
    assert rows1 == rows2  # bit-stable re-generation


def test_determinism_across_parallelism(spark):
    a = sorted(map(tuple, gen.transcripts(spark, 1500, parallelism=2).collect()))
    b = sorted(map(tuple, gen.transcripts(spark, 1500, parallelism=7).collect()))
    assert a == b


def test_row_count_and_skew(spark):
    df = gen.transcripts(spark, 6000).cache()
    assert df.count() == 6000
    per_conv = df.groupBy("conv_id").count()
    sizes = sorted(r["count"] for r in per_conv.collect())
    assert sizes[-1] >= gen.HOT_TURNS  # hot conversations exist
    assert sizes[0] <= gen.COLD_TURNS
    df.unpersist()


def test_turn_ordering_contiguous(spark):
    from pyspark.sql import functions as F

    df = gen.transcripts(spark, 1000)
    check = df.groupBy("conv_id").agg(
        F.min("turn_idx").alias("lo"), F.max("turn_idx").alias("hi"), F.count("*").alias("n")
    )
    for r in check.collect():
        assert r["lo"] == 0
        assert r["hi"] == r["n"] - 1  # contiguous 0..n-1


def test_format_mix_and_parseability(spark):
    df = gen.transcripts(spark, 4000)
    texts = [r["text"] for r in df.collect()]
    kinds = {"json": 0, "ecs": 0, "plain": 0, "metric": 0}
    for t in texts:
        if t.startswith("["):
            kinds["plain"] += 1
            continue
        d = json.loads(t)  # every JSON-ish line must be valid JSON
        if "metric" in d and "value" in d:
            kinds["metric"] += 1
        elif "@timestamp" in d:
            kinds["ecs"] += 1
        else:
            kinds["json"] += 1
    n = len(texts)
    assert 0.45 < kinds["json"] / n < 0.65
    assert 0.15 < kinds["ecs"] / n < 0.35
    assert 0.05 < kinds["plain"] / n < 0.15
    assert 0.05 < kinds["metric"] / n < 0.15


def test_tool_only_for_tool_role(spark):
    df = gen.transcripts(spark, 2000)
    from pyspark.sql import functions as F

    bad = df.filter(
        ((F.col("role") == "tool") & (F.col("tool") == ""))
        | ((F.col("role") != "tool") & (F.col("tool") != ""))
    ).count()
    assert bad == 0
