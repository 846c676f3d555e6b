"""spark-submit entrypoint for the corpus quality report (data card).

    spark-submit --py-files logshipper_spark.zip jobs/run_corpus_report.py \
        --docs /path/to/documents.parquet --out /path/to/report.json \
        [--approx-distinct 0.01] [--near-dup-sample 0.2] \
        [--near-dup-threshold 0.8] [--lm-band 2.0:16.0]

Prints the JSON report to stdout and writes it to --out. At 100 TB pass
--approx-distinct (HLL++ sketch instead of exact COUNT DISTINCT) and a
small --near-dup-sample; everything else is already bounded
aggregation. See logshipper_spark/datapipe/report.py for the
composition."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--approx-distinct", type=float, default=None)
    ap.add_argument("--near-dup-sample", type=float, default=0.2)
    ap.add_argument("--near-dup-threshold", type=float, default=0.8)
    ap.add_argument("--lm-band", default="2.0:16.0", metavar="LO:HI")
    args = ap.parse_args(argv)

    from logshipper_spark.datapipe.report import corpus_report
    from logshipper_spark.session import get_spark

    spark = get_spark(app_name="logshipper-corpus-report")
    docs = spark.read.parquet(args.docs)
    lo, hi = (float(x) for x in args.lm_band.split(":"))
    rep = corpus_report(
        docs,
        approx_distinct=args.approx_distinct,
        lm_band=(lo, hi),
        near_dup_sample=args.near_dup_sample,
        near_dup_threshold=args.near_dup_threshold,
    )
    with open(args.out, "w") as f:
        json.dump(rep, f, indent=2)
    print(json.dumps(rep))
    return 0


if __name__ == "__main__":
    sys.exit(main())
