"""spark-submit entrypoint for the pre-tokenization pipeline — curated
corpus in, packed fixed-length training sequences out. The step after
jobs/run_curation.py: its sharded corpus (or any (doc_id, text[,
source]) parquet) becomes the integer chunk stream a trainer consumes.

    spark-submit --py-files logshipper_spark.zip jobs/run_pretokenize.py \
        --docs /path/to/corpus --out /path/to/out \
        [--vocab PATH]        reuse an existing vocabulary parquet
        [--vocab-size 50000] [--min-count 2]   (when building one)
        [--budget 2048]       tokens per training sequence
        [--group-col source]  independent pack streams (omit to pack all
                              documents into one stream)
        [--no-bos-eos]        pack raw body ids only
        [--codec zstd]        output codec (zstd default: training
                              loaders and non-Spark readers decode it)

Stages (each one shuffle-bounded; see PLANS.md for the plan shapes):
1. vocabulary — reuse ``--vocab`` or build with tokenize.vocab_build
   (one map-side-combined count + TakeOrdered) and write ``out/vocab``.
2. tokenize — tokenize_ids (broadcast vocab join + positional regroup)
   written to ``out/tokens`` and read back schema-pinned, so the pack
   and assemble actions share materialized bytes instead of re-running
   the tokenize chain per action.
3. pack + assemble — pack_chunks on size(ids) (block-offset running
   sum) then assemble_chunks (slice join + chunk_pos rebuild), written
   to ``out/chunks`` repartitioned by hash of the chunk key so file
   sizes track chunk counts.

Writes:
  out/vocab/         — (token, token_id, count)        [unless --vocab]
  out/tokens/        — (doc_id, ids, n_tokens, n_oov, <group>) where
                       <group> is --group-col, or a constant `_stream`
                       column when packing one global stream
  out/chunks/        — (group, chunk_id, ids, n_tokens)
  out/summary.json   — docs, token/OOV totals, chunk fill accounting
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# runnable as plain `python jobs/run_pretokenize.py` too (spark-submit
# ships the package via --py-files)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True, help="corpus parquet (doc_id, text)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--vocab", default=None,
                    help="existing vocabulary parquet (token, token_id, count)")
    ap.add_argument("--vocab-size", type=int, default=50_000)
    ap.add_argument("--min-count", type=int, default=2)
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--group-col", default=None,
                    help="pack per this column (e.g. source); default one stream")
    ap.add_argument("--no-bos-eos", action="store_true")
    ap.add_argument("--codec", default="zstd")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from logshipper_spark.datapipe import packing, tokenize
    from logshipper_spark.session import get_spark

    spark = get_spark(app_name="logshipper-pretokenize")
    docs = spark.read.parquet(args.docs)
    summary: dict = {"docs_in": docs.count()}

    # 1. vocabulary — reuse or build
    vocab_schema = "token string, token_id long, count long"
    if args.vocab:
        vocab = spark.read.schema(vocab_schema).parquet(args.vocab)
    else:
        tokenize.vocab_build(
            docs, max_size=args.vocab_size, min_count=args.min_count
        ).write.mode("overwrite").option("compression", args.codec).parquet(
            os.path.join(args.out, "vocab")
        )
        vocab = spark.read.schema(vocab_schema).parquet(
            os.path.join(args.out, "vocab")
        )
    summary["vocab_size"] = vocab.count()

    # 2. tokenize, materialize, read back schema-pinned (pack and
    # assemble both act on it — share bytes, not lineage)
    ids = tokenize.tokenize_ids(
        docs, vocab, add_bos_eos=not args.no_bos_eos
    )
    group = args.group_col
    if group:
        ids = ids.join(docs.select("doc_id", group), "doc_id")
    else:
        group = "_stream"
        ids = ids.withColumn(group, F.lit(0))
    ids.write.mode("overwrite").option("compression", args.codec).parquet(
        os.path.join(args.out, "tokens")
    )
    ids_back = (
        spark.read.schema(ids.schema)
        .parquet(os.path.join(args.out, "tokens"))
        .withColumn("_n", F.size("ids").cast("long"))
    )
    tok_tot = ids_back.agg(
        F.sum("n_tokens").alias("t"),
        F.sum("n_oov").alias("o"),
        F.sum("_n").alias("s"),
    ).head()
    summary.update(
        body_tokens=int(tok_tot["t"] or 0),
        oov_tokens=int(tok_tot["o"] or 0),
        stream_tokens=int(tok_tot["s"] or 0),
    )

    # 3. pack + assemble the fixed-length sequences
    layout = packing.pack_chunks(
        ids_back, budget=args.budget, group_col=group, tokens_col="_n"
    )
    chunks = packing.assemble_chunks(ids_back, layout, group_col=group)
    (
        chunks.repartition(F.col(group), F.col("chunk_id"))
        .write.mode("overwrite")
        .option("compression", args.codec)
        .parquet(os.path.join(args.out, "chunks"))
    )
    back = spark.read.schema(chunks.schema).parquet(
        os.path.join(args.out, "chunks")
    )
    fill = back.agg(
        F.count("*").alias("n_chunks"),
        F.sum("n_tokens").alias("packed"),
        F.sum((F.col("n_tokens") == args.budget).cast("long")).alias("full"),
    ).head()
    summary.update(
        n_chunks=int(fill["n_chunks"] or 0),
        packed_tokens=int(fill["packed"] or 0),
        full_chunks=int(fill["full"] or 0),
    )

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
