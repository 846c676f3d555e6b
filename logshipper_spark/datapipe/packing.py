"""Sequence packing for training-data pipelines.

Concat-and-split packing (the GPT-style pretraining layout): each
group's documents are concatenated in a deterministic order and the
resulting token stream is cut into fixed-`budget` chunks; a document
may span a chunk boundary. The LogShipper reference has no packing
layer — this is the standard public technique (Brown et al. 2020
"GPT-3" §2.2 trains on fixed-length concatenated sequences), which is
expressible exactly as a running sum + an interval/chunk overlap
explode, so it stays fully relational.

Scale posture: the running token sum uses the block-offset two-phase
decomposition (sampling.block_running_sum — no task scans a group's
full history even when one source holds half the corpus). The overlap
explode is map-only and emits ceil(n_tokens/budget)+1 rows per
document at most, so output size is O(total_tokens / budget + docs).
Chunk ids are derived arithmetic (floor(offset / budget)) — no second
shuffle is needed to assign them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import textstats
from .sampling import block_running_sum


def pack_chunks(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    block_size: int = 4096,
) -> DataFrame:
    """Assign every document its slice positions in the packed chunk
    layout: one output row per (document, chunk) overlap with

    - `chunk_id`   — 0-based chunk index within the group,
    - `doc_begin`/`doc_end` — the half-open token range of the document
      that lands in this chunk (doc-relative),
    - `chunk_pos`  — the offset inside the chunk where that slice
      starts.

    Documents are laid out per group in `order_col` order (unique
    within the group); the concatenated token stream is cut every
    `budget` tokens, so every chunk except each group's last is
    exactly full. Zero-token documents occupy no stream space and
    produce no rows. Everything is exact integer arithmetic over a
    deterministic order — reproducible run-to-run and partition-
    independent."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    toks = (
        F.col(tokens_col)
        if tokens_col
        else textstats.token_count(F.col(text_col))
    ).cast("long")
    d = block_running_sum(
        df.withColumn("_tok", toks),
        group_col,
        order_col,
        "_tok",
        block_size,
        "_end",
    ).withColumn("_start", F.col("_end") - F.col("_tok"))
    d = d.filter(F.col("_tok") > 0)
    # integer DIV, not floor(double /): offsets are nonnegative longs,
    # so DIV is floor division and stays exact past 2^53 stream tokens
    chunk_lo = F.expr(f"_start DIV {budget}")
    chunk_hi = F.expr(f"(_end - 1) DIV {budget}")
    exploded = d.select(
        F.col(group_col),
        F.col(order_col),
        F.col("_tok"),
        F.col("_start"),
        F.explode(F.sequence(chunk_lo, chunk_hi)).alias("chunk_id"),
    )
    cstart = F.col("chunk_id") * budget
    doc_begin = F.greatest(F.lit(0).cast("long"), cstart - F.col("_start"))
    doc_end = F.least(F.col("_tok"), cstart + budget - F.col("_start"))
    return exploded.select(
        group_col,
        "chunk_id",
        order_col,
        doc_begin.alias("doc_begin"),
        doc_end.alias("doc_end"),
        (F.col("_start") + doc_begin - cstart).alias("chunk_pos"),
    )


def chunk_stats(packed: DataFrame, group_col: str = "source") -> DataFrame:
    """Per-chunk fill accounting over pack_chunks output: document
    count and filled token count (== budget everywhere except each
    group's final chunk). One map-side-combined groupBy."""
    return packed.groupBy(group_col, "chunk_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("doc_end") - F.col("doc_begin")).alias("fill_tokens"),
    )
