"""Training-shard sequence-packing batch job (spark-submit entrypoint) —
the curation pipeline's terminal stage: curated docs -> packed context
windows.

docs parquet (doc_id, text, source) [optionally joined against a
committed curation-verdicts snapshot table so only kept docs pack] ->
per-source concat-and-split packing (operators/chunking.py
pack_sequences — the same core the oracle-gated ``sequence_pack``
catalog query pins) -> one pack-manifest row per doc (exact bigint
offset, window ids, straddle flag) snapshot-committed.

Resumable on doc_id with OFFSET CONTINUATION: an incremental run packs
only never-committed docs, but each source's stream start is the
committed stream END (max(tok_offset + n_tokens) per source read from
the table) — the batch analog of the streaming packer's state store, so
the union of all committed runs equals one batch pack of the docs in
arrival order.

    spark-submit --py-files ocr_parallel_spark.zip scripts/job_pack.py \
        --input /data/docs --output /data/packs \
        [--verdicts /data/verdicts] [--window-tokens 512]
"""

from __future__ import annotations

import argparse
import json


def committed_base_offsets(spark, table):
    """Per-source next pack offset from the committed pack table:
    ``(source, base_offset)`` — the packed stream's current end. None
    when the table is empty (first run)."""
    from pyspark.sql import functions as F

    committed = table.read(spark)
    if committed is None:
        return None
    return committed.groupBy("source").agg(
        F.max(F.col("tok_offset") + F.col("n_tokens"))
        .cast("long")
        .alias("base_offset")
    )


def build_output(spark, docs, window_tokens, base_offsets=None, n_tokens_col=None):
    """The packing transform over one run's TODO slice.

    ``n_tokens_col`` names a column already on the docs table carrying
    a real tokenizer's counts (e.g. a BPE pass landed them upstream);
    offsets/window ids then match deployment tokenization exactly.
    Default: the whitespace counter inside pack_sequences (the oracle
    twin)."""
    from pyspark.sql import functions as F

    from ocr_parallel_spark.operators.chunking import pack_sequences
    from ocr_parallel_spark.operators.classify import normalize_col

    withnorm = docs.withColumn("norm", normalize_col(F.coalesce(F.col("text"), F.lit(""))))
    return pack_sequences(
        withnorm,
        window_tokens,
        base_offsets=base_offsets,
        n_tokens_col=n_tokens_col,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="docs parquet (doc_id, text, source)")
    ap.add_argument("--output", required=True, help="pack-manifest snapshot table root")
    ap.add_argument(
        "--verdicts",
        help="curation-verdicts snapshot table: only docs with kept=true pack",
    )
    ap.add_argument(
        "--from-verdicts",
        help="pack the CURATED CORPUS directly: read kept docs' cleaned "
        "text (kept_text) out of this verdicts snapshot table — no "
        "second read of the raw corpus (job_curate emits the column)",
    )
    ap.add_argument("--window-tokens", type=int, default=512)
    ap.add_argument(
        "--n-tokens-col",
        help="column on the input docs holding precomputed (tokenizer-"
        "faithful) token counts; default counts whitespace tokens",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ocr-parallel-spark-pack").getOrCreate()

    from ocr_parallel_spark.io.snapshot import SnapshotTable, run_resumable

    if bool(args.input) == bool(args.from_verdicts):
        raise SystemExit("exactly one of --input / --from-verdicts required")
    if args.from_verdicts:
        verdicts = SnapshotTable(args.from_verdicts).read(spark)
        if verdicts is None:
            raise SystemExit("--from-verdicts table is empty; run job_curate first")
        if "kept_text" not in verdicts.columns or "source" not in verdicts.columns:
            raise SystemExit(
                "--from-verdicts table predates the curated-corpus schema "
                "(no kept_text/source columns); re-run job_curate "
                "--recompute to materialize it"
            )
        # A kept row with NULL kept_text is a pre-upgrade commit read
        # through mergeSchema — packing it would inject a phantom
        # 1-token doc at a wrong offset. Refuse loudly instead.
        n_stale = verdicts.filter("kept AND kept_text IS NULL").count()
        if n_stale:
            raise SystemExit(
                f"--from-verdicts: {n_stale} kept rows have no kept_text "
                "(committed before the curated-corpus schema); run "
                "job_curate --recompute first"
            )
        pass_cols = [args.n_tokens_col] if args.n_tokens_col else []
        if args.n_tokens_col and args.n_tokens_col not in verdicts.columns:
            raise SystemExit(
                f"--n-tokens-col {args.n_tokens_col!r} not in the verdicts "
                "table (job_curate does not emit tokenizer counts; land "
                "them on the verdicts table with an upstream tokenizer "
                f"pass first). columns: {verdicts.columns}"
            )
        docs = verdicts.filter("kept").select(
            "doc_id", "source", verdicts["kept_text"].alias("text"), *pass_cols
        )
    else:
        docs = spark.read.parquet(args.input)
        if args.n_tokens_col and args.n_tokens_col not in docs.columns:
            raise SystemExit(
                f"--n-tokens-col {args.n_tokens_col!r} not in the input "
                f"docs table; columns: {docs.columns}"
            )
        if args.verdicts:
            verdicts = SnapshotTable(args.verdicts).read(spark)
            if verdicts is None:
                raise SystemExit("--verdicts table is empty; run job_curate first")
            docs = docs.join(
                verdicts.filter("kept").select("doc_id"), "doc_id", "semi"
            )
    table = SnapshotTable(args.output)
    base = committed_base_offsets(spark, table)
    snap = run_resumable(
        docs,
        table,
        spark,
        lambda todo: build_output(
            spark, todo, args.window_tokens, base, args.n_tokens_col
        ),
        key_col="doc_id",
        lineage={"input": args.input or args.from_verdicts,
                 "window_tokens": args.window_tokens},
    )
    print(json.dumps(snap))
    spark.stop()


if __name__ == "__main__":
    main()
