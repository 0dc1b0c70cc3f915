"""Web-corpus curation batch job (spark-submit entrypoint).

docs parquet (doc_id, url, text, lang, source) -> per-document screens
(language ID, token count, PII, domain blocklist — the SAME curate_docs
definition the streaming tier runs) -> inter-document line dedup (CCNet
boilerplate removal over the docs' real newlines; single-line docs fall
back to fixed-width word lines) -> exact dedup on the CLEANED text ->
optional benchmark decontamination (--bench parquet with a ``text``
column) -> per-doc verdict rows snapshot-committed, resumable on doc_id
(a crash or a re-run with new docs processes only never-committed ids).

    spark-submit --py-files ocr_parallel_spark.zip scripts/job_curate.py \
        --input /data/docs --output /data/verdicts \
        [--blocklist hosts.txt] [--bench /data/eval_docs]
"""

from __future__ import annotations

import argparse
import json


def build_output(
    spark,
    docs,
    blocked_hosts=None,
    bench_docs=None,
    min_line_count: int = 5,
    line_tokens: int = 8,
):
    """The batch curation composition; returns one verdict row per doc.

    ``blocked_hosts``: DataFrame with a ``host`` column (empty screen if
    None). ``bench_docs``: DataFrame with a ``text`` column whose word
    8-grams define the decontamination set (stage skipped if None).

    Resume scope note: under run_resumable the corpus-global signals
    (line frequencies, the dup window) see only the never-committed
    TODO slice of each run — a line must repeat within a run to be
    dropped. That is the standard incremental-curation tension; the
    arbiter is a periodic full-corpus recompute over the committed
    table, exactly the streaming-ingest / batch-compaction split the
    rest of the engine uses (streaming/curation.py docstring)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ocr_parallel_spark.functions.curation import word_lines, word_ngrams
    from ocr_parallel_spark.operators.classify import normalize_col
    from ocr_parallel_spark.operators.linededup import dedup_lines
    from ocr_parallel_spark.streaming.curation import curate_docs

    if blocked_hosts is None:
        blocked_hosts = spark.createDataFrame([], "host string")
    screens = curate_docs(docs, blocked_hosts)

    # Real web text carries newlines; the synthetic corpus is
    # single-line, so fall back to fixed-width word lines there — the
    # downstream frequency algebra is line-source agnostic.
    norm = normalize_col("text")
    has_nl = F.instr(F.col("text"), "\n") > 0
    lines_arr = F.when(has_nl, F.split(F.col("text"), "\n")).otherwise(
        word_lines(F.split(norm, " "), line_tokens)
    )
    lines = docs.select(
        "doc_id", F.posexplode(lines_arr).alias("line_no", "line")
    )
    lined = dedup_lines(lines, min_count=min_line_count).select(
        "doc_id", F.col("n_kept").alias("n_kept_lines"), "kept_text"
    )

    j = screens.join(lined, "doc_id")
    w = Window.partitionBy(F.sha2(F.col("kept_text"), 256)).orderBy("doc_id")
    j = j.withColumn("_dup", F.row_number().over(w) > 1)

    if bench_docs is not None:
        grams = word_ngrams(F.split(normalize_col("text"), " "), 8)
        bench = F.broadcast(
            bench_docs.select(F.explode(F.array_distinct(grams)).alias("gram"))
            .distinct()
        )
        doc_grams = docs.select(
            "doc_id", F.explode(F.array_distinct(grams)).alias("gram")
        )
        hits = (
            doc_grams.join(bench, "gram").select("doc_id").distinct()
            .withColumn("_cont", F.lit(True))
        )
        j = j.join(hits, "doc_id", "left").withColumn(
            "contaminated", F.coalesce(F.col("_cont"), F.lit(False))
        )
    else:
        j = j.withColumn("contaminated", F.lit(False))

    reason = F.coalesce(
        F.col("drop_reason"),
        F.when(F.col("n_kept_lines") == 0, F.lit("boilerplate"))
        .when(F.col("contaminated"), F.lit("contaminated"))
        .when(F.col("_dup"), F.lit("dup")),
    )
    return j.select(
        "doc_id",
        "host",
        "pred_lang",
        "n_tokens",
        "n_pii",
        "n_kept_lines",
        "contaminated",
        reason.isNull().alias("kept"),
        reason.alias("drop_reason"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--blocklist", help="text file, one host per line")
    ap.add_argument("--bench", help="parquet of eval docs (text column)")
    ap.add_argument("--min-line-count", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ocr-parallel-spark-curate").getOrCreate()

    from ocr_parallel_spark.io.snapshot import SnapshotTable, run_resumable

    docs = spark.read.parquet(args.input)
    blocked = None
    if args.blocklist:
        hosts = [
            (ln.strip(),)
            for ln in open(args.blocklist, encoding="utf-8")
            if ln.strip()
        ]
        blocked = spark.createDataFrame(hosts, "host string")
    bench = spark.read.parquet(args.bench) if args.bench else None
    table = SnapshotTable(args.output)
    snap = run_resumable(
        docs,
        table,
        spark,
        lambda todo: build_output(
            spark, todo, blocked, bench, args.min_line_count
        ),
        key_col="doc_id",
        lineage={"input": args.input},
    )
    print(json.dumps(snap))
    spark.stop()


if __name__ == "__main__":
    main()
