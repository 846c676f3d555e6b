"""Scenario simulation (reference: bench/incident_simulator_test.go):
the generator plants a deterministic incident — latency ×10 and 30%
errors on the payment→db edge inside a fixed seconds-of-day window —
and the detector must alert on that edge inside the window."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from logshipper_spark import anomaly, gen, pipeline

N_TURNS = 40_000
WINDOW_START = datetime.datetime(2024, 3, 1, 12, 0, 0)  # BASE_TS + 43200s
WINDOW_END = datetime.datetime(2024, 3, 1, 13, 0, 0)    # BASE_TS + 46800s
# resolver maps db -> db-service (gen.lookup_hosts)
EDGE = "payment|db-service|INSERT transactions"


@pytest.fixture(scope="module")
def alerts(spark):
    tr = gen.transcripts(spark, N_TURNS).cache()
    enr = pipeline.normalize_and_enrich(spark, tr).cache()
    metrics = enr.filter("src_service <> '' AND dst_service <> ''").selectExpr(
        "src_service || '|' || dst_service || '|' || operation AS edge_key",
        "ts", "conv_id", "turn_idx", "latency_us / 1000.0 AS value",
    )
    out = anomaly.detect_alerts(
        metrics, key_cols=["edge_key"], value_col="value",
        order_cols=["ts", "conv_id", "turn_idx"], ts_col="ts",
        window_size=100, threshold=3.0, cooldown_s=30.0,
    ).collect()
    enr.unpersist()
    tr.unpersist()
    return out


def test_incident_edge_alerts_inside_window(alerts):
    edge_alerts = [r for r in alerts if r["edge_key"] == EDGE]
    in_window = [r for r in edge_alerts if WINDOW_START <= r["ts"] < WINDOW_END]
    assert in_window, f"no incident alert; edge alerts at {[r['ts'] for r in edge_alerts]}"
    # the strongest excursion on that edge is the planted incident
    strongest = max(edge_alerts, key=lambda r: abs(r["zscore"]))
    assert WINDOW_START <= strongest["ts"] < WINDOW_END


def test_detection_is_prompt(alerts):
    """Event-time detection latency: the first in-window alert fires
    within seconds of the window opening (reference target: < 2 s of
    wall time; here the event-time analogue over a 2 s turn cadence)."""
    in_window = sorted(
        r["ts"] for r in alerts
        if r["edge_key"] == EDGE and WINDOW_START <= r["ts"] < WINDOW_END
    )
    lag = (in_window[0] - WINDOW_START).total_seconds()
    assert lag <= 600, f"first alert {lag}s after incident start"
