"""spark-submit entrypoint for the training-data curation pipeline.

    spark-submit --py-files logshipper_spark.zip jobs/run_curation.py \
        --docs /path/to/documents.parquet --out /path/to/out \
        [--min-quality 0.3] [--near-dup] [--minhash-threshold 0.9] \
        [--components]

Writes:
  out/keep_list/      — (doc_id, quality, exact_dup_count) survivors
  out/components/     — (doc_id, component) near-dup clusters (--components)
  out/summary.json    — row counts per stage (printed to stdout too)
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True, help="documents parquet (doc_id, text)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--near-dup", action="store_true",
                    help="MinHash-LSH near-dup removal after exact dedup")
    ap.add_argument("--minhash-threshold", type=float, default=0.9)
    ap.add_argument("--components", action="store_true",
                    help="also write near-dup connected components")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from logshipper_spark.datapipe import curate, dedup
    from logshipper_spark.session import get_spark

    spark = get_spark(app_name="logshipper-curation")
    docs = spark.read.parquet(args.docs)
    n_in = docs.count()

    keep = curate.curate(
        docs,
        min_quality=args.min_quality,
        near_dup=args.near_dup,
        minhash_threshold=args.minhash_threshold,
    )
    keep.write.mode("overwrite").parquet(os.path.join(args.out, "keep_list"))
    dedup.release_cached_signatures()  # minhash sig cache, post-action
    kept = spark.read.parquet(os.path.join(args.out, "keep_list"))
    n_keep = kept.count()
    n_exact_dups = int(
        kept.agg(F.sum(F.col("exact_dup_count") - 1)).first()[0] or 0
    )

    summary = {
        "docs_in": n_in,
        "kept": n_keep,
        "dropped": n_in - n_keep,
        "exact_dup_copies_collapsed": n_exact_dups,
    }
    if args.components:
        pairs = dedup.minhash_lsh_pairs(docs, threshold=args.minhash_threshold)
        comps = dedup.near_dup_components(pairs)
        comps.write.mode("overwrite").parquet(os.path.join(args.out, "components"))
        dedup.release_cached_signatures()
        summary["near_dup_docs_in_components"] = spark.read.parquet(
            os.path.join(args.out, "components")
        ).count()

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
