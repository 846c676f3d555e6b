"""Memory / shuffle posture at the scale-headroom input (6M turns):
peak execution memory, shuffle bytes, and spill per headline query,
pulled from the Spark status REST API while the queries run.

    python tools/mem_posture.py [n_turns]

Prints a markdown table for BASELINE.md — the bytes-per-row basis for
the 100 TB extrapolation (wall-time alone says nothing about whether a
partition fits executor memory). The session enables the UI (the
engine default keeps it off) solely to expose /api/v1.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from logshipper_spark import aggregate as agg  # noqa: E402
from logshipper_spark import anomaly, gen, pipeline, route  # noqa: E402
from logshipper_spark.session import get_spark  # noqa: E402


def _rest(app_id: str, path: str):
    url = f"http://localhost:4040/api/v1/applications/{app_id}{path}"
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def _mb(b: float) -> str:
    return f"{b / (1 << 20):,.0f}"


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    spark = get_spark(
        app_name="mem-posture", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    app_id = spark.sparkContext.applicationId

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    tr = gen.transcripts(spark, n_turns).cache()
    tr.count()
    enr = pipeline.normalize_and_enrich(spark, tr)
    force(enr)  # warmup: codegen/JIT outside the measured stages

    rows = []

    def measure(name: str, fn) -> None:
        before = {s["stageId"] for s in _rest(app_id, "/stages")}
        t0 = time.time()
        fn()
        dt = time.time() - t0
        stages = [
            s
            for s in _rest(app_id, "/stages")
            if s["stageId"] not in before and s["status"] == "COMPLETE"
        ]
        tot = lambda k: sum(s.get(k) or 0 for s in stages)  # noqa: E731
        peak = max((s.get("peakExecutionMemory") or 0 for s in stages), default=0)
        rows.append(
            (name, round(dt, 1), len(stages), _mb(tot("shuffleWriteBytes")),
             _mb(tot("shuffleReadBytes")), _mb(tot("memoryBytesSpilled")),
             _mb(tot("diskBytesSpilled")), _mb(peak))
        )

    measure("parse→enrich→order (noop-forced)", lambda: force(enr))
    measure(
        "route → per-sink windowed counts",
        lambda: force(
            route.sink_counts(
                route.routed_rows(enr, gen.routing_rules()), ts_col="ts"
            )
        ),
    )
    measure(
        "edge aggregate (bounded two-phase ring)",
        lambda: force(
            agg.edge_agg(enr, ts_col="event_ts", order_cols=["ts", "conv_id", "turn_idx"])
        ),
    )
    measure(
        "rolling z-score",
        lambda: force(
            anomaly.rolling_zscore(
                enr.filter("src_service <> '' AND dst_service <> ''").selectExpr(
                    "src_service || '|' || dst_service AS edge_key",
                    "ts", "conv_id", "turn_idx", "latency_us / 1000.0 AS value",
                ),
                key_cols=["edge_key"], value_col="value",
                order_cols=["ts", "conv_id", "turn_idx"],
            )
        ),
    )
    measure(
        "error-rate feed (two-phase running sums)",
        lambda: force(
            anomaly.edge_metric_feed(
                enr.filter("src_service <> '' AND dst_service <> ''"),
                key_cols=["src_service", "dst_service", "operation"],
                order_cols=["ts", "conv_id", "turn_idx"],
            )
        ),
    )

    execs = _rest(app_id, "/executors")
    peak_heap = max(
        (e.get("peakMemoryMetrics", {}).get("JVMHeapMemory", 0) for e in execs),
        default=0,
    )

    print(f"\nInput: {n_turns:,} generated turns, "
          f"{spark.sparkContext.master}, app {app_id}\n")
    print("| query | wall s | stages | shuffle write MB | shuffle read MB "
          "| mem spill MB | disk spill MB | peak task mem MB |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(str(x) for x in r) + " |")
    print(f"\nPeak JVM heap (single local-mode executor): {_mb(peak_heap)} MB")


if __name__ == "__main__":
    main()
