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
        [--input-format warc]  # raw .warc/.warc.gz archives instead of parquet
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
    robots_df=None,
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
    # build_output scans `docs` several times (screens, lines x2 via
    # dedup_lines' documented double read, grams); under run_resumable
    # that lineage is source-scan + committed-table anti-join, so pin it
    # once — checkpoint blocks are freed by the ContextCleaner when the
    # result is dropped (the dedup_lines docstring's own advice).
    docs = docs.localCheckpoint(eager=False)
    screens = curate_docs(docs, blocked_hosts)

    if robots_df is not None:
        # Retroactive robots screen (functions/robots.py): folded into
        # drop_reason BEFORE the content stages so a disallowed doc can
        # never claim a dup-canonical slot. ``robots_df``: (host,
        # robots_txt). A url with no path component matches as '/'.
        from ocr_parallel_spark.functions.robots import apply_robots, parse_robots
        from ocr_parallel_spark.functions.urls import host_col

        path = F.regexp_extract(
            F.col("url"), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]+(/\S*)?", 1
        )
        urls = docs.select(
            "doc_id",
            host_col(F.col("url")).alias("host"),
            F.when(path == "", F.lit("/")).otherwise(path).alias("path"),
        )
        verdict = apply_robots(urls, parse_robots(robots_df)).select(
            "doc_id", "disallowed"
        )
        screens = (
            screens.join(verdict, "doc_id", "left")
            .withColumn(
                "drop_reason",
                F.coalesce(
                    F.col("drop_reason"),
                    F.when(
                        F.coalesce(F.col("disallowed"), F.lit(False)),
                        F.lit("robots"),
                    ),
                ),
            )
            .withColumn("kept", F.col("drop_reason").isNull())
            .drop("disallowed")
        )

    # Real web text carries newlines; the synthetic corpus is
    # single-line, so fall back to fixed-width word lines there — the
    # downstream frequency algebra is line-source agnostic. Split on
    # \r?\n, not \n: CRLF docs would otherwise carry a trailing \r per
    # line, splitting every banner's frequency count across the two
    # line-ending variants (and splitting dup hashes the same way).
    norm = normalize_col("text")
    has_nl = F.instr(F.col("text"), "\n") > 0
    lines_arr = F.when(has_nl, F.split(F.col("text"), r"\r?\n")).otherwise(
        word_lines(F.split(norm, " "), line_tokens)
    )
    lines = docs.select(
        "doc_id", F.posexplode(lines_arr).alias("line_no", "line")
    )
    lined = dedup_lines(lines, min_count=min_line_count).select(
        "doc_id", F.col("n_kept").alias("n_kept_lines"), "kept_text"
    )

    j = screens.join(lined, "doc_id")

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

    # Exact-dup ranking runs ONLY over docs that survive every earlier
    # stage (screens, boilerplate, contamination — hence computed after
    # the bench join): a screened-out doc must never claim the canonical
    # slot, or its kept twin would be dropped as 'dup' and the content
    # permanently lost from the committed kept set. Ranking the eligible
    # subset also keeps the all-boilerplate kept_text='' mass out of the
    # window — at scale that constant key would otherwise funnel
    # millions of rows into one straggler task.
    eligible = j.filter(
        F.col("drop_reason").isNull()
        & (F.col("n_kept_lines") > 0)
        & ~F.col("contaminated")
    ).select("doc_id", F.sha2(F.col("kept_text"), 256).alias("_kh"))
    w = Window.partitionBy("_kh").orderBy("doc_id")
    dups = (
        eligible.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .select("doc_id", F.lit(True).alias("_dup"))
    )
    j = j.join(dups, "doc_id", "left").withColumn(
        "_dup", F.coalesce(F.col("_dup"), F.lit(False))
    )

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
    ap.add_argument(
        "--input-format",
        choices=("parquet", "warc"),
        default="parquet",
        help="parquet: a docs table (doc_id, url, text, ...); warc: a "
        "directory of .warc/.warc.gz archives read via sources/warc.py "
        "(doc_id = xxhash64(url) for stable resume keys)",
    )
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--sniff-charset",
        action="store_true",
        help="warc input only: BOM/header/meta charset sniffing instead "
        "of assuming UTF-8 (kernel sniff_and_decode; replace, never raise)",
    )
    ap.add_argument("--blocklist", help="text file, one host per line")
    ap.add_argument(
        "--robots", help="parquet of robots bodies (host, robots_txt columns)"
    )
    ap.add_argument("--bench", help="parquet of eval docs (text column)")
    ap.add_argument("--min-line-count", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ocr-parallel-spark-curate").getOrCreate()

    from ocr_parallel_spark.io.snapshot import SnapshotTable, run_resumable

    if args.input_format == "warc":
        from ocr_parallel_spark.sources.warc import warc_docs

        docs = warc_docs(spark, args.input, sniff_charset=args.sniff_charset)
    else:
        docs = spark.read.parquet(args.input)
    blocked = None
    if args.blocklist:
        with open(args.blocklist, encoding="utf-8") as fh:
            hosts = [(ln.strip(),) for ln in fh if ln.strip()]
        blocked = spark.createDataFrame(hosts, "host string")
    bench = spark.read.parquet(args.bench) if args.bench else None
    robots = spark.read.parquet(args.robots) if args.robots else None
    table = SnapshotTable(args.output)
    snap = run_resumable(
        docs,
        table,
        spark,
        lambda todo: build_output(
            spark, todo, blocked, bench, args.min_line_count, robots_df=robots
        ),
        key_col="doc_id",
        lineage={"input": args.input},
    )
    print(json.dumps(snap))
    spark.stop()


if __name__ == "__main__":
    main()
