"""Skew handling for hot conversations (north rule: salted
repartitioning + AQE skew hints).

At 10^12-turn scale a single hot conversation can carry millions of
turns. Two operators here keep per-task state bounded:

* ``turn_rank_salted`` — the stable turn ordering (W11) computed in two
  phases so no task ever holds a whole hot conversation: rows are
  bucketed by contiguous ``turn_idx`` blocks, ranked locally per
  (conv, block), then shifted by per-block offsets (a tiny aggregate —
  one row per (conv, block) — windowed over blocks). Equivalent to
  ``row_number() over (partition by conv_id order by turn_idx)`` for
  any input (turn_idx need not be dense), verified against the
  single-phase window in tests.

* ``salted_agg`` — generic two-level aggregation with an explicit salt
  column for aggregates whose combine is associative. Note Spark's
  hash aggregation already does map-side partial aggregation, which
  absorbs most key skew for plain groupBys; the explicit salt matters
  when the first level itself is a wide operator (e.g. collect_list /
  exact percentiles per hot key) or under sort-based aggregation.

AQE's skew-join splitting (enabled in session.py) covers the join
side; these cover windows and aggregations, which AQE does not split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Shared invariants of the block-offset two-phase pattern (this
# module's turn_rank_salted, anomaly.rolling_zscore_blocked /
# edge_metric_feed, datapipe.sampling.block_running_sum): the offset
# equi-join must be NULL-SAFE on the group key — a plain equi-join
# silently drops every NULL-key row the single-window form scores —
# and the block id must be NEVER NULL or NULL-order rows vanish the
# same way.

#: block id for NULL ordering keys: sorts before any realistic block
#: (floor(order/block_size) reaches −2⁶² only for order ids below
#: −2⁶²·block_size), mirroring the window form's ASC-nulls-first.
NULL_BLOCK = -(1 << 62)


def group_key_struct(*cols: str) -> Column:
    """The group key wrapped in ONE struct: struct equality treats
    NULL fields as equal, so windows/groupBys/joins keyed on it keep
    NULL groups AND share one hash partitioning (an eqNullSafe join
    condition is also null-safe but its required distribution differs
    from the windows', forcing an extra full-data exchange)."""
    return F.struct(*[F.col(c) for c in cols])


def null_safe_block(order: Column, block_size: int) -> Column:
    """``floor(order / block_size)`` with NULL orders in NULL_BLOCK."""
    return F.coalesce(F.floor(order / block_size), F.lit(NULL_BLOCK))


def turn_rank_salted(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    block_size: int = 4096,
    out_col: str = "turn_rank",
) -> DataFrame:
    """Distributed row_number over (conv ordered by turn) with bounded
    per-task partitions.

    Phase 1 partitions by (conv, floor(turn/block)) — blocks are ranges
    of the ordering key, so block order == row order. Phase 2 computes
    each block's starting offset as the running sum of earlier blocks'
    counts (a window over the per-block count table, which has
    ~n_turns/block_size rows — tiny)."""
    # null-safe group key + never-null block id (module-top invariant):
    # a NULL conv or NULL turn must rank like the single-window
    # row_number, not vanish through the offset equi-join
    with_blk = df.withColumn("_ck", group_key_struct(conv_col)).withColumn(
        "_blk", null_safe_block(F.col(turn_col), block_size)
    )
    local_w = Window.partitionBy("_ck", "_blk").orderBy(turn_col)
    ranked = with_blk.withColumn("_local_rank", F.row_number().over(local_w))

    counts = with_blk.groupBy("_ck", "_blk").agg(F.count("*").alias("_cnt"))
    off_w = (
        Window.partitionBy("_ck")
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(off_w), F.lit(0))
    ).drop("_cnt")

    return (
        ranked.join(offsets, ["_ck", "_blk"])
        .withColumn(out_col, (F.col("_local_rank") + F.col("_off")).cast("int"))
        .drop("_ck", "_blk", "_local_rank", "_off")
    )


def with_salt(df: DataFrame, salt_buckets: int, *salt_source: str) -> DataFrame:
    """Salt column for two-level aggregation. Prefer deterministic row
    content (``salt_source`` columns that vary WITHIN a group — e.g.
    turn_idx); without a source, fall back to the physical row position
    (partition id + row id), which spreads any hot key across buckets
    and cannot affect results (the salt only shapes the partial
    aggregation, never the final combine)."""
    if salt_source:
        cols = [F.col(c) for c in salt_source]
        salt = F.pmod(F.xxhash64(*cols), F.lit(salt_buckets))
    else:
        salt = F.pmod(
            F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
            F.lit(salt_buckets),
        )
    return df.withColumn("_salt", salt)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt_buckets: int = 32,
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Two-level aggregation: groupBy(keys + salt) with ``partial_aggs``
    then groupBy(keys) with ``final_aggs`` over the partial columns.
    Pass ``salt_source`` columns that vary within a group (e.g.
    turn_idx) for a deterministic salt; omitted, the salt comes from
    physical row position (still correct — see with_salt). NEVER pass
    the group keys: a salt constant within each group is a no-op."""
    salted = with_salt(df, salt_buckets, *(salt_source or []))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_sink_counts(
    routed: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 minute",
    salt_buckets: int = 32,
) -> DataFrame:
    """Skew-hardened variant of route.sink_counts: identical result
    (including the NULL-timestamp bucket), but a hot (sink, conv,
    window) key is first reduced across ``salt_buckets`` sub-keys
    (salt = hash(turn_idx)) before the final combine — bounding any
    single reducer's input even if sort-based aggregation is in play.

    NULL ts rows land in a NULL ``window_start`` group exactly like
    route.sink_counts' default ``null_bucket=True`` path: the sentinel
    goes INSIDE window() (Spark's TimeWindowing rule injects an
    ``input IS NOT NULL`` filter that would otherwise silently DROP
    the row — module invariant / CLAUDE.md), and the start column is
    NULLed back afterwards."""
    from .route import is_error_pattern

    is_error = is_error_pattern()
    sentinel = F.to_timestamp(F.lit("0001-01-01 00:00:00"))
    w = F.window(F.coalesce(F.col(ts_col), sentinel), window_duration)
    keyed = routed.select(
        "sink",
        "conv_id",
        F.when(F.col(ts_col).isNotNull(), w["start"]).alias("window_start"),
        F.col("tool"),
        is_error.alias("_is_err"),
        F.col("turn_idx"),
    )
    return salted_agg(
        keyed,
        keys=["sink", "conv_id", "window_start"],
        partial_aggs=[
            F.count("*").alias("_tc"),
            F.count_if(F.col("tool") != "").alias("_tool"),
            F.count_if(F.col("_is_err")).alias("_err"),
        ],
        final_aggs=[
            F.sum("_tc").alias("turn_count"),
            F.sum("_tool").alias("tool_call_count"),
            F.sum("_err").alias("error_pattern_count"),
        ],
        salt_buckets=salt_buckets,
        salt_source=["turn_idx"],
    )
