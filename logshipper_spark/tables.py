"""Transcript table layout: the Iceberg partition spec from SURVEY §4.2
(``days(ts), bucket(conv_id, N)``) realized as a physical layout that
works with or without an Iceberg catalog.

With Iceberg (real cluster): ``CREATE TABLE ... PARTITIONED BY
(days(ts), bucket(N, conv_id))`` and the identical write path. In this
sandbox (no Iceberg runtime): hive-style parquet partitioning on the
derived columns ``ts_day`` and ``conv_bucket`` — Spark prunes
partitions from both at scan time (verified in tests via the plan's
partition filters), which is the property that matters at 100 TB:

* time-range queries (the per-sink windowed aggregates) touch only the
  ``ts_day`` partitions in range;
* per-conversation lookups and co-located conv-keyed work touch one
  ``conv_bucket``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 32


def with_partition_cols(df: DataFrame, n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Derive the partition columns (Iceberg computes these same
    transforms internally: days(ts) and bucket(conv_id))."""
    return df.withColumn("ts_day", F.to_date("ts")).withColumn(
        "conv_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    )


def write_transcripts(
    df: DataFrame, path: str, n_buckets: int = DEFAULT_BUCKETS, mode: str = "overwrite"
) -> None:
    (
        with_partition_cols(df, n_buckets)
        .write.mode(mode)
        .partitionBy("ts_day", "conv_bucket")
        .parquet(path)
    )


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def conv_bucket_of(conv_id: str, n_buckets: int = DEFAULT_BUCKETS) -> F.Column:
    """Driver-side helper: the bucket predicate for a point lookup —
    ``read.filter(conv_bucket_of(cid)).filter(col('conv_id') == cid)``
    prunes to one bucket directory per day."""
    return F.col("conv_bucket") == F.pmod(
        F.xxhash64(F.lit(conv_id)), F.lit(n_buckets)
    ).cast("int")
