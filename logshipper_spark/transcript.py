"""Conversation-level transcript analytics.

The input table is the north-rule transcript shape
``(conv_id, turn_idx, role, text, tool, ts)`` — multi-turn
conversation / agent traces. The reference pipeline treats each line
independently (event-at-a-time, ``internal/pipeline/pipeline.go``);
these operators add the conversation-granularity views an LLM-training
corpus owner needs on the same rows: per-conversation rollups, tool /
role step-transition counts (Markov structure of agent traces),
depth funnels, transcript→document rendering (the doc-ification step
that feeds the dedup / packing family), and user→assistant SFT pair
extraction.

Scale posture (100 TB lens): every per-conversation computation is a
window or groupBy keyed on ``conv_id`` whose per-group work is bounded
by the conversation length (hot conversations are long but bounded —
gen.HOT_TURNS models them); nothing sorts more than one conversation
in one task, and the only unpartitioned window in the file runs over
the funnel's depth histogram, whose row count is bounded by the
maximum conversation length, not the corpus size. All ratios are
exact integer micros (count·10⁶ DIV total) so cross-engine results
are hash-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MICROS = 1_000_000


def _step_label(role: Column, tool: Column) -> Column:
    """Step label for transition mining: the role, suffixed with the
    tool name for tool turns (``tool:search``), so one transition
    matrix captures both conversation structure and tool usage."""
    return F.when(tool != "", F.concat(role, F.lit(":"), tool)).otherwise(role)


def conv_agg_exprs(ts_col: str = "ts") -> list[Column]:
    """The shared per-conversation aggregate list — one definition used
    by both the batch rollup (`conv_stats`) and the watermarked
    streaming session rollup (`streaming.streaming_conv_stats`), so the
    two paths cannot drift."""
    ts = F.col(ts_col)
    role = F.col("role")
    tool = F.col("tool")
    return [
        F.count(F.lit(1)).alias("n_turns"),
        F.max("turn_idx").alias("max_turn_idx"),
        F.sum(F.when(role == "user", 1).otherwise(0)).alias("user_turns"),
        F.sum(F.when(role == "assistant", 1).otherwise(0)).alias("assistant_turns"),
        F.sum(F.when(role == "system", 1).otherwise(0)).alias("system_turns"),
        F.sum(F.when(role == "tool", 1).otherwise(0)).alias("tool_turns"),
        F.sum(F.when(tool != "", 1).otherwise(0)).alias("tool_calls"),
        # collect_set drops NULLs, so gating on tool != '' matches
        # COUNT(DISTINCT CASE WHEN tool<>'' THEN tool END)
        F.size(F.collect_set(F.when(tool != "", tool))).alias("distinct_tools"),
        F.min(ts).alias("first_ts"),
        F.max(ts).alias("last_ts"),
        (F.unix_timestamp(F.max(ts)) - F.unix_timestamp(F.min(ts)))
        .cast("long")
        .alias("duration_s"),
    ]


def conv_stats(turns: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Per-conversation rollup: turn counts by role, tool-call count,
    distinct tools, time span.

    One hash-partitioned groupBy with map-side partial aggregation —
    a single shuffle moving one compact row per conversation.
    ``duration_s`` is whole seconds (the generator's ts grid is
    second-resolution; DuckDB twin: ``date_diff('second', ...)``).
    """
    return turns.groupBy("conv_id").agg(*conv_agg_exprs(ts_col))


def step_transitions(
    turns: DataFrame, start_marker: str = "START"
) -> DataFrame:
    """Markov transition counts over consecutive turn step labels
    within each conversation (ordered by ``turn_idx``).

    The step label is ``role`` for plain turns and ``role:tool`` for
    tool turns (one matrix captures conversation structure AND tool
    usage). A conversation's first turn transitions from
    ``start_marker``. ``prob_micros`` is the exact integer row
    probability ``count·10⁶ DIV (total out of prev_step)``.

    Scale: the lag window is partitioned by conv_id (per-task work
    bounded by conversation length); the transition groupBy output is
    at most (roles·tools+1)² rows — broadcast-small at any corpus
    size.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    step = _step_label(F.col("role"), F.col("tool"))
    # the start marker applies ONLY to each conversation's first row
    # (row_number gate) — coalescing lag's NULL would also rewrite a
    # genuinely NULL previous step label (NULL role) as a conversation
    # start, inflating START's out-total and halving its probabilities
    steps = turns.select(
        "conv_id",
        "turn_idx",
        step.alias("step"),
        F.lag(step).over(w).alias("prev_raw"),
        F.row_number().over(w).alias("_rn"),
    ).select(
        F.when(F.col("_rn") == 1, F.lit(start_marker))
        .otherwise(F.col("prev_raw"))
        .alias("prev_step"),
        "step",
    )
    counts = steps.groupBy("prev_step", "step").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    w_prev = Window.partitionBy("prev_step")
    return counts.select(
        "prev_step",
        "step",
        "n_transitions",
        F.sum("n_transitions").over(w_prev).alias("_out_total"),
    ).select(
        "prev_step",
        "step",
        "n_transitions",
        F.expr(f"n_transitions * {MICROS}L DIV _out_total").alias("prob_micros"),
    )


def conv_funnel(turns: DataFrame) -> DataFrame:
    """Conversation depth funnel: for every observed conversation
    length k, how many conversations reached AT LEAST k turns, and
    the retention ratio vs all conversations (exact integer micros).

    Two shuffles on shrinking keys: conv sizes (one row per
    conversation) → depth histogram (one row per distinct length,
    bounded by the max conversation length). The reverse running sum
    runs over that bounded histogram only — the single-partition
    window never sees corpus-sized data.
    """
    sizes = turns.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    hist = sizes.groupBy("n_turns").agg(F.count(F.lit(1)).alias("n_convs_exact"))
    w = (
        Window.orderBy(F.col("n_turns").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = Window.orderBy(F.col("n_turns").desc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return hist.select(
        F.col("n_turns").alias("depth"),
        "n_convs_exact",
        F.sum("n_convs_exact").over(w).alias("n_convs_at_least"),
        F.sum("n_convs_exact").over(total).alias("_total"),
    ).select(
        "depth",
        "n_convs_exact",
        "n_convs_at_least",
        F.expr(f"n_convs_at_least * {MICROS}L DIV _total").alias(
            "retention_micros"
        ),
    )


def render_conversations(turns: DataFrame, sep: str = "\n") -> DataFrame:
    """Render each conversation into one training document:
    turn lines ``role[tool]: text`` joined in ``turn_idx`` order.

    This is the transcript→document step in front of the document
    pipeline (dedup / quality / packing, ``datapipe/``): downstream
    consumers treat the rendered string exactly like ``documents.text``.

    One groupBy(conv_id) shuffle; ``sort_array`` over the collected
    struct orders by the leading ``turn_idx`` field, so the render is
    deterministic under any partitioning. Per-task memory is one
    conversation's turns — bounded by conversation length.
    """
    # role/text coalesce to '' so a NULL lane cannot NULL the whole
    # line (concat propagates NULL and array_join then silently DROPS
    # the turn while n_turns still counts it — the rendered doc would
    # lose turns with no signal)
    line = F.concat(
        F.coalesce(F.col("role"), F.lit("")),
        F.when(F.col("tool") != "", F.concat(F.lit("["), F.col("tool"), F.lit("]")))
        .otherwise(F.lit("")),
        F.lit(": "),
        F.coalesce(F.col("text"), F.lit("")),
    )
    return (
        turns.select("conv_id", F.struct("turn_idx", line.alias("line")).alias("tl"))
        .groupBy("conv_id")
        .agg(F.sort_array(F.collect_list("tl")).alias("tls"))
        .select(
            "conv_id",
            F.size("tls").alias("n_turns"),
            F.array_join(F.transform("tls", lambda s: s["line"]), sep).alias("doc"),
        )
        .withColumn("n_chars", F.length("doc"))
    )


def sft_pairs(turns: DataFrame) -> DataFrame:
    """Extract (prompt, response) supervised-fine-tuning pairs: each
    assistant turn paired with the NEAREST PRECEDING user turn in the
    same conversation. Assistant turns with no preceding user turn
    (conversation openers, system-led prefixes) are dropped.

    Spark form: running ``last(user-gated struct, ignorenulls=True)``
    over a conv-partitioned window — O(1) running state per task, no
    buffering of the window frame. DuckDB twin: ``last_value(...
    IGNORE NULLS) OVER (... ROWS BETWEEN UNBOUNDED PRECEDING AND 1
    PRECEDING)``.
    """
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prompt = F.last(
        F.when(F.col("role") == "user", F.struct("turn_idx", "text")),
        ignorenulls=True,
    ).over(w)
    return (
        turns.select("conv_id", "turn_idx", "role", "text", prompt.alias("p"))
        .where((F.col("role") == "assistant") & F.col("p").isNotNull())
        .select(
            "conv_id",
            F.col("p.turn_idx").alias("prompt_turn_idx"),
            F.col("turn_idx").alias("response_turn_idx"),
            F.col("p.text").alias("prompt"),
            F.col("text").alias("response"),
        )
    )


def integrity_report(turns: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Per-conversation ingest-integrity report — the data-quality gate
    that must run BEFORE any turn-ordered window is trusted at corpus
    scale (the reference assumes channel-FIFO order,
    internal/pipeline/pipeline.go:76-94; a distributed ingest has no
    such guarantee, so violations must be counted, not assumed away).

    Per ``conv_id``: ``n_turns``; ``ts_inversions`` (rows whose ts is
    EARLIER than some preceding row's ts in (turn_idx, ts) order — a
    running-max comparison, so non-adjacent regressions count too);
    ``dup_turn_idx`` (non-NULL turn_idx repeats); ``missing_turn_idx``
    (holes in the min..max index span); ``starts_at_zero``;
    ``null_turn_idx`` / ``null_ts`` / ``blank_role`` / ``null_text``
    row counts; and the composite ``conv_ok`` verdict. Never drops or
    repairs rows — it reports, the caller decides.

    Ordering is pinned NULLS FIRST on both sort keys (DuckDB defaults
    NULLS LAST — the oracle must say ``NULLS FIRST`` explicitly). NULL
    ts rows sort first, can never be inversions themselves (NULL < x is
    NULL), and are excluded from the running max by max()'s NULL skip.

    Scale posture: one conv-partitioned running-max window (per-task
    work bounded by conversation length) feeding one map-side-combined
    groupBy — the same single-shuffle shape as ``conv_stats``.
    """
    ts = F.col(ts_col)
    idx = F.col("turn_idx")
    w = (
        Window.partitionBy("conv_id")
        .orderBy(idx.asc_nulls_first(), ts.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # role/text reduce to their boolean lanes BEFORE the window: the
    # conv-partitioned exchange otherwise ships full document text just
    # to null/blank-check it after the shuffle — two bits per row
    # instead at 100 TB, identical results
    flagged = turns.select(
        "conv_id",
        "turn_idx",
        (F.col("role").isNull() | (F.col("role") == "")).alias("_blank_role"),
        F.col("text").isNull().alias("_null_text"),
        ts.alias("_ts"),
        (ts < F.max(ts).over(w)).alias("_inv"),
    )
    long_sum = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    report = flagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        long_sum(F.col("_inv")).alias("ts_inversions"),
        (F.count("turn_idx") - F.countDistinct("turn_idx"))
        .cast("long")
        .alias("dup_turn_idx"),
        F.coalesce(
            (
                F.max("turn_idx").cast("long")
                - F.min("turn_idx")
                + 1
                - F.countDistinct("turn_idx")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("missing_turn_idx"),
        F.coalesce(F.min("turn_idx") == 0, F.lit(False)).alias("starts_at_zero"),
        long_sum(F.col("turn_idx").isNull()).alias("null_turn_idx"),
        long_sum(F.col("_ts").isNull()).alias("null_ts"),
        long_sum(F.col("_blank_role")).alias("blank_role"),
        long_sum(F.col("_null_text")).alias("null_text"),
    )
    ok = (
        (F.col("ts_inversions") == 0)
        & (F.col("dup_turn_idx") == 0)
        & (F.col("missing_turn_idx") == 0)
        & F.col("starts_at_zero")
        & (F.col("null_turn_idx") == 0)
        & (F.col("null_ts") == 0)
        & (F.col("blank_role") == 0)
        & (F.col("null_text") == 0)
    )
    return report.withColumn("conv_ok", ok)
