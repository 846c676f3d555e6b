"""Benchmark decontamination: n-gram overlap against an eval set.

Standard public technique (Brown et al. 2020 "GPT-3" appendix C
13-gram overlap; Rae et al. 2021 "Gopher" §A.2; Dolma/RedPajama
pipelines): a training document is contaminated iff it shares at
least `min_overlap` distinct word n-grams with the benchmark corpus.

Scale posture (the 100 TB side is `docs`, the benchmark side is
small — eval suites are at most millions of rows):
- benchmark grams are DISTINCT'd once (one shuffle of the small side)
  and then **broadcast**, so the corpus scan never shuffles;
- per-document grams are deduped per-row (array_distinct) BEFORE the
  explode, bounding explode fan-out at distinct-gram count;
- explode → broadcast hash join → partial count all pipeline inside
  one stage (no materialization of the exploded rows);
- the only corpus-keyed shuffle carries (doc_id, count) for documents
  that matched at least one gram — at sane contamination rates that is
  orders of magnitude smaller than the corpus.

Note Spark 4.1 does not register `bloom_filter_agg`/`might_contain`
in the public function registry, so a bloom prefilter ahead of the
explode is not available without private APIs; the broadcast join is
the standard production shape regardless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import textstats
from .filters import word_ngrams


def doc_grams(df: DataFrame, n: int, text_col: str = "text"):
    """Per-row DISTINCT lowercase word n-grams as an array column."""
    toks = textstats.tokens(F.lower(F.col(text_col)))
    return F.array_distinct(word_ngrams(toks, n))


def benchmark_grams(
    bench: DataFrame, n: int = 8, text_col: str = "text"
) -> DataFrame:
    """Distinct word n-grams of the benchmark corpus — one column
    `gram`. Small by construction (eval suites); intended to be
    broadcast by decontaminate()."""
    return (
        bench.select(F.explode(doc_grams(bench, n, text_col)).alias("gram"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    assume_sparse: bool = True,
) -> DataFrame:
    """Per-document contamination verdict against a benchmark corpus:
    ``(id_col, n_overlap, contaminated)`` where `n_overlap` counts the
    DISTINCT benchmark n-grams the document contains and
    `contaminated` is `n_overlap >= min_overlap`. Documents with no
    overlap are kept with n_overlap = 0, so the output is a full
    per-document verdict table (filter on ~contaminated to clean).

    Exact — no hashing anywhere in the match path: grams join as
    strings, so there are no false positives to reason about at
    10^12-document scale.

    `assume_sparse` (default) broadcasts the per-doc overlap counts
    for the verdict join back onto the corpus, keeping the 100 TB side
    shuffle-free end-to-end — correct whenever contaminated documents
    are a small fraction of the corpus (the normal case). Set False if
    contamination may be dense; the verdict join then shuffles on
    id_col instead of risking a driver-size broadcast."""
    grams = F.broadcast(benchmark_grams(bench, n, text_col))
    posting = docs.select(
        F.col(id_col), F.explode(doc_grams(docs, n, text_col)).alias("gram")
    )
    counts = (
        posting.join(grams, "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
    )
    if assume_sparse:
        counts = F.broadcast(counts)
    return (
        docs.select(id_col)
        .join(counts, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_overlap"), F.lit(0).cast("long")).alias(
                "n_overlap"
            ),
            (
                F.coalesce(F.col("n_overlap"), F.lit(0)) >= min_overlap
            ).alias("contaminated"),
        )
    )
