"""logshipper_spark — a PySpark-native log/telemetry analytics engine.

A from-scratch reimplementation of the capabilities of the reference
log pipeline (yevheniiamoiseieva/LogShipper, Go): parse → enrich →
route → aggregate over tables of multi-turn conversation/agent
transcripts, expressed as Spark DataFrame plans (Catalyst-optimized,
whole-stage-codegen friendly) rather than a port of the reference's
row-at-a-time channel dataflow.

Design rules (enforced throughout):
  * declarative DataFrame/SQL plans; no RDDs, no driver-side row loops
  * native ``pyspark.sql.functions`` in the hot path; Arrow-vectorized
    pandas UDFs only where semantics genuinely require them
    (sequential per-key anomaly state, exact Go case-transform rules)
  * broadcast joins for dimension lookups; shuffles only at the
    aggregate boundaries; AQE + salting for skewed conversations
"""

__version__ = "0.1.0"

__all__ = [
    "aggregate", "anomaly", "config", "enrich", "formats", "gen",
    "graphalg", "parse", "pipeline", "route", "schemas", "session",
    "sinks", "skew", "streaming", "streaming_anomaly", "tables",
    "template", "transform", "datapipe",
]
