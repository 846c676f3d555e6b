"""Vocabulary construction and tokenization-to-ids: the text → integer
training-sequence step that sits between curation (curate.py) and
sequence packing (packing.pack_chunks).

Scale posture: the vocabulary count is one map-side-combined groupBy on
the token key (Zipf skew arrives pre-combined per map task); top-size
selection is a distributed TakeOrdered (never a global sort of the
token stream); id assignment runs over at most ``max_size`` rows — a
user constant, not a data-sized relation. Tokenization joins the
BROADCAST vocabulary (≤ max_size rows by construction) against the
exploded token stream and rebuilds per-document id arrays with a
positional sort — per-task input bounded by document size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens

# special token ids, reserved below the learned vocabulary
UNK_ID = 0
BOS_ID = 1
EOS_ID = 2
N_SPECIALS = 3


def positional_values(pos_col: str, val_col: str):
    """Aggregation expression: the non-null ``val_col`` values of
    collected ``(pos, val)`` structs in position order — the
    positional-rebuild half of every posexplode_outer regroup. The
    null-valued row is the empty-document marker (kept by the groupBy
    so empty docs survive, contributing no values). Shared by
    tokenize_ids and bpe.bpe_segment."""
    return F.transform(
        F.sort_array(
            F.filter(
                F.collect_list(F.struct(pos_col, val_col)),
                lambda s: s[val_col].isNotNull(),
            )
        ),
        lambda s: s[val_col],
    )


def vocab_build(
    df: DataFrame,
    text_col: str = "text",
    max_size: int = 50_000,
    min_count: int = 1,
) -> DataFrame:
    """Build a frequency vocabulary: the ``max_size`` most frequent
    lower-cased whitespace tokens (textstats.tokens — the shared
    tokenizer, so ids align with every other token statistic in the
    datapipe) with count >= ``min_count``, assigned dense ids
    ``N_SPECIALS..`` in (count DESC, token ASC) order — the
    deterministic tie-break makes the id assignment reproducible across
    engines, partitionings, and runs.

    Returns (token, token_id, count). Plan: explode → one
    map-side-combined count shuffle → TakeOrdered(max_size) → a
    row_number over ONLY the surviving ≤ max_size rows (bounded by the
    constant, not the corpus — the single-partition window is fine
    because its input is user-constant-sized).
    """
    counts = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
    )
    top = counts.orderBy(F.col("count").desc(), F.col("token")).limit(max_size)
    rank = F.row_number().over(Window.orderBy(F.col("count").desc(), F.col("token")))
    return top.select(
        "token",
        (rank + (N_SPECIALS - 1)).cast("long").alias("token_id"),
        "count",
    )


def tokenize_ids(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_bos_eos: bool = True,
) -> DataFrame:
    """Map each document's tokens to vocabulary ids (OOV → UNK_ID),
    optionally wrapping with BOS/EOS. Output: (id_col, ids
    array<long>, n_tokens, n_oov) — n_tokens counts body tokens
    (specials excluded), so it feeds straight into
    ``packing.pack_chunks`` / ``token_budget_head`` accounting.

    The exploded token stream LEFT-joins the broadcast vocabulary and
    regroups per document with a positional sort — one explode-regroup
    shuffle (the broadcast join adds none), per-task state bounded by
    document size. Empty documents keep a row ([BOS,EOS] or [])."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode_outer(tokens(F.lower(F.col(text_col)))).alias("_pos", "_tok"),
    )
    joined = toks.join(
        F.broadcast(vocab.select(F.col("token").alias("_tok"), "token_id")),
        "_tok",
        "left",
    ).select(
        "_id",
        "_pos",
        # posexplode_outer emits one (null pos, null tok) row for an
        # empty array — keep it so empty docs survive the groupBy, but
        # don't let it contribute an id
        F.when(F.col("_pos").isNotNull(), F.coalesce("token_id", F.lit(UNK_ID)))
        .cast("long")
        .alias("_tid"),
    )
    body = positional_values("_pos", "_tid")
    ids = (
        F.concat(
            F.array(F.lit(BOS_ID).cast("long")),
            body,
            F.array(F.lit(EOS_ID).cast("long")),
        )
        if add_bos_eos
        else body
    )
    return (
        joined.groupBy("_id")
        .agg(
            ids.alias("ids"),
            F.sum(F.col("_tid").isNotNull().cast("long")).alias("n_tokens"),
            F.sum((F.col("_tid") == UNK_ID).cast("long")).alias("n_oov"),
        )
        .select(
            F.col("_id").alias(id_col),
            "ids",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_oov"), F.lit(0)).cast("long").alias("n_oov"),
        )
    )
