"""Statistical evaluation of the z-score detector on a labeled
synthetic dataset — the port of the reference's eval harness
(reference: bench/anomaly_eval_test.go:14-153): 10,000 baseline values
~ N(50, 10²) with 50 planted anomalies at mean + k·sigma, k ∈ {4,5,6},
grid search over (threshold, window), CI gate best F1 ≥ 0.85.

Go's PRNG differs from numpy's, so the dataset is re-derived with the
same *distribution recipe* under a fixed numpy seed and labels are
carried alongside (the reference evaluates against its own labels the
same way).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from logshipper_spark import anomaly

GRID = [(2.0, 50), (2.5, 50), (3.0, 50), (3.0, 100), (3.0, 200), (3.5, 100)]
N, N_ANOM = 10_000, 50
MEAN, SIGMA = 50.0, 10.0


def build_dataset(seed: int = 42):
    rng = np.random.default_rng(seed)
    values = rng.normal(MEAN, SIGMA, N)
    labels = np.zeros(N, dtype=bool)
    # planted positions: spread out, none in the warmup prefix
    positions = rng.choice(np.arange(500, N), size=N_ANOM, replace=False)
    ks = rng.choice([4.0, 5.0, 6.0], size=N_ANOM)
    for pos, k in zip(positions, ks):
        values[pos] = MEAN + k * SIGMA
        labels[pos] = True
    return values, labels


@pytest.fixture(scope="module")
def eval_df(spark):
    values, labels = build_dataset()
    rows = [
        ("eval:eval", int(i), float(v), bool(l))
        for i, (v, l) in enumerate(zip(values, labels))
    ]
    return spark.createDataFrame(
        rows, "edge_key string, idx long, value double, is_anomaly_label boolean"
    ).cache()


def _f1(spark_df, window: int, threshold: float) -> float:
    scored = anomaly.rolling_zscore(
        spark_df, key_cols=["edge_key"], value_col="value",
        order_cols=["idx"], window_size=window, threshold=threshold,
    )
    agg = scored.agg(
        F.count_if(F.col("is_anomaly") & F.col("is_anomaly_label")).alias("tp"),
        F.count_if(F.col("is_anomaly") & ~F.col("is_anomaly_label")).alias("fp"),
        F.count_if(~F.col("is_anomaly") & F.col("is_anomaly_label")).alias("fn"),
    ).first()
    tp, fp, fn = agg["tp"], agg["fp"], agg["fn"]
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    return 2 * p * r / (p + r) if p + r else 0.0


def test_dataset_sanity(eval_df):
    stats = eval_df.agg(
        F.count("*"), F.count_if("is_anomaly_label"),
        F.avg(F.when(~F.col("is_anomaly_label"), F.col("value"))),
    ).first()
    assert stats[0] == N
    assert stats[1] == N_ANOM
    assert abs(stats[2] - MEAN) < 1.0


def test_best_f1_meets_reference_gate(eval_df):
    best, best_cfg = 0.0, None
    for threshold, window in GRID:
        f1 = _f1(eval_df, window, threshold)
        if f1 > best:
            best, best_cfg = f1, (threshold, window)
    # reference gate: best F1 over the grid >= 0.85
    # (reference achieves 0.925 at threshold 3.5 / window 100)
    assert best >= 0.85, f"best F1 {best:.3f} at {best_cfg}"
