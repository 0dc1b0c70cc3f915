"""The production batch job (spark-submit entrypoint).

Read the pages table -> extraction pipeline (kernel + keep-first url dedup
+ exact/near content dedup) -> snapshot-committed, resumable output with
per-run lineage counters. Re-running after a crash or with new input rows
processes only never-committed urls (anti-join against the committed
snapshot) — the reference's job-completion-by-file-existence poll (X9)
replaced by atomic snapshot commits.

    spark-submit --py-files ocr_parallel_spark.zip scripts/job_extract.py \
        --input /data/pages --output /data/results
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument(
        "--input-format",
        choices=("parquet", "warc"),
        default="parquet",
        help="parquet: a pages table; warc: raw .warc/.warc.gz archives "
        "(sources/warc.py warc_pages — html = response body, warc_ts = "
        "WARC-Date)",
    )
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--near-dups",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="mark SimHash near-duplicates (disable with --no-near-dups)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ocr-parallel-spark-extract").getOrCreate()

    from ocr_parallel_spark.io.snapshot import SnapshotTable, run_resumable
    from ocr_parallel_spark.pipeline import run_extraction_pipeline

    if args.input_format == "warc":
        from ocr_parallel_spark.sources.warc import warc_pages

        pages = warc_pages(spark, args.input)
    else:
        pages = spark.read.parquet(args.input)
    table = SnapshotTable(args.output)
    snap = run_resumable(
        pages,
        table,
        spark,
        lambda todo: run_extraction_pipeline(todo, near_dups=args.near_dups),
        key_col="url",
        lineage={"input": args.input},
    )
    print(json.dumps(snap))
    spark.stop()


if __name__ == "__main__":
    main()
