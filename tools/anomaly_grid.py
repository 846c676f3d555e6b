"""Print the detector accuracy grid (precision/recall/F1 + TP/FP/FN)
on the labeled synthetic dataset — our side of the reference's Task 2
table (reference: bench/anomaly_eval_test.go:14-153,
docs/benchmark-results.md:37-44). Same distribution recipe (10k
N(50,10²), 50 planted k·σ anomalies, k∈{4,5,6}), numpy seed 42.

    python tools/anomaly_grid.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from logshipper_spark import anomaly  # noqa: E402
from logshipper_spark.session import get_spark  # noqa: E402
from tests.test_anomaly_eval import GRID, build_dataset  # noqa: E402


def main() -> None:
    spark = get_spark()
    values, labels = build_dataset()
    df = spark.createDataFrame(
        [("e", int(i), float(v), bool(l)) for i, (v, l) in enumerate(zip(values, labels))],
        "edge_key string, idx long, value double, is_anomaly_label boolean",
    ).cache()
    df.count()

    print("| threshold | window | Precision | Recall | F1 | TP/FP/FN |")
    print("|---|---|---|---|---|---|")
    for threshold, window in GRID:
        scored = anomaly.rolling_zscore(
            df, key_cols=["edge_key"], value_col="value",
            order_cols=["idx"], window_size=window, threshold=threshold,
        )
        r = scored.agg(
            F.count_if(F.col("is_anomaly") & F.col("is_anomaly_label")).alias("tp"),
            F.count_if(F.col("is_anomaly") & ~F.col("is_anomaly_label")).alias("fp"),
            F.count_if(~F.col("is_anomaly") & F.col("is_anomaly_label")).alias("fn"),
        ).first()
        tp, fp, fn = r["tp"], r["fp"], r["fn"]
        p = tp / (tp + fp) if tp + fp else 0.0
        rc = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * rc / (p + rc) if p + rc else 0.0
        print(f"| {threshold} | {window} | {p:.3f} | {rc:.3f} | {f1:.3f} | {tp}/{fp}/{fn} |")


if __name__ == "__main__":
    main()
