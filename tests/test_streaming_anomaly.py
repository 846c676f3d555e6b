"""Stateful streaming detector vs the batch window-function detector:
same alerts on the same ordered series, including across micro-batch
boundaries (state survives between batches)."""

from __future__ import annotations

import pytest

from logshipper_spark import anomaly, streaming_anomaly


def _series(spark, n=400, spikes=(250, 300, 352)):
    # steady N(50)-ish values with planted spikes; deterministic
    rows = []
    base = 50.0
    for i in range(n):
        v = base + ((i * 2654435761) % 97) / 97.0  # small jitter
        if i in spikes:
            v = base + 40.0
        rows.append(("edge-a", f"2024-03-01 00:{i // 60:02d}:{i % 60:02d}", v, i))
    return spark.createDataFrame(
        rows, "key string, ts_s string, value double, idx int"
    ).selectExpr("key", "CAST(ts_s AS TIMESTAMP) AS ts", "value", "idx")


@pytest.fixture(scope="module")
def alerts_pair(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sanom")
    df = _series(spark)
    # two files split at the midpoint → two micro-batches in ts order
    df.filter("idx < 200").coalesce(1).write.parquet(str(tmp / "in" / "a"))
    df.filter("idx >= 200").coalesce(1).write.parquet(str(tmp / "in" / "b"))

    stream = (
        spark.readStream.schema("key string, ts timestamp, value double, idx int")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp / "in" / "*"))
    )
    out = streaming_anomaly.streaming_alerts(
        stream, window_size=100, threshold=3.0, cooldown_s=30.0
    )
    q = (
        out.writeStream.format("memory")
        .queryName("alerts_mem")
        .outputMode("append")
        .option("checkpointLocation", str(tmp / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("SELECT key, ts, value FROM alerts_mem").collect()

    batch = anomaly.detect_alerts(
        df, key_cols=["key"], value_col="value", order_cols=["ts", "idx"],
        ts_col="ts", window_size=100, threshold=3.0, cooldown_s=30.0,
    ).select("key", "ts", "value").collect()
    return streamed, batch


def test_streaming_alerts_match_batch(alerts_pair):
    streamed, batch = alerts_pair
    assert len(batch) > 0, "fixture must plant detectable spikes"
    assert sorted((r["ts"], r["value"]) for r in streamed) == sorted(
        (r["ts"], r["value"]) for r in batch
    )


def test_streaming_alerts_cooldown_suppresses(alerts_pair):
    streamed, _ = alerts_pair
    # spikes at idx 250 and 300 are 50s apart (> cooldown) → both alert;
    # idx 352 is 52s after 300 → alerts as well; but each spike is a
    # single excursion so no double alerts within one episode
    tss = sorted(r["ts"] for r in streamed)
    assert len(tss) == len(set(tss))


def test_state_ttl_path_still_matches_batch(spark, tmp_path, alerts_pair):
    """With a generous TTL the detector behaves identically; this also
    exercises the ProcessingTimeTimeout code path end-to-end."""
    df = _series(spark)
    df.coalesce(1).write.parquet(str(tmp_path / "in"))
    stream = (
        spark.readStream.schema("key string, ts timestamp, value double, idx int")
        .parquet(str(tmp_path / "in"))
    )
    out = streaming_anomaly.streaming_alerts(
        stream, window_size=100, threshold=3.0, cooldown_s=30.0,
        state_ttl_ms=3_600_000,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("alerts_ttl")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT ts, value FROM alerts_ttl").collect()
    _, batch = alerts_pair
    assert sorted((r["ts"], r["value"]) for r in got) == sorted(
        (r["ts"], r["value"]) for r in batch
    )
