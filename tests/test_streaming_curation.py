"""Streaming-tier curation: the same curate_docs definition must produce
identical results in a micro-batch stream and in batch (the two-tier
contract of streaming/curation.py), and restart must process only new
files."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs_with_urls(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn(
            "url",
            F.concat(
                F.lit("https://site-"),
                (F.col("doc_id") % 7).cast("string"),
                F.lit(".example.com/p/"),
                F.col("doc_id").cast("string"),
            ),
        )
        .select("doc_id", "url", "text", "lang", "source")
    )


def _blocklist(spark):
    return spark.createDataFrame(
        [("site-3.example.com",), ("site-5.example.com",)], "host string"
    )


def test_stream_batch_equivalence_and_resume(spark, sf_dir, tmp_path):
    from ocr_parallel_spark.streaming.curation import (
        curate_docs,
        run_curation_available_now,
    )

    docs = _docs_with_urls(spark, sf_dir)
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs.filter(F.col("doc_id") < 250).write.parquet(inp)

    run_curation_available_now(spark, inp, out, ckpt, _blocklist(spark))
    got1 = spark.read.parquet(out)
    assert got1.count() == 250

    # identical to running the SAME definition in batch
    want = curate_docs(docs.filter(F.col("doc_id") < 250), _blocklist(spark))
    sort_cols = ["doc_id"]
    assert (
        got1.orderBy(*sort_cols).collect() == want.orderBy(*sort_cols).collect()
    )
    # blocked hosts dropped with precedence over every content reason
    blocked = got1.filter(F.col("host").isin("site-3.example.com", "site-5.example.com"))
    assert blocked.count() > 0
    assert blocked.filter(F.col("drop_reason") != "blocked").count() == 0

    # restart: only the new file is processed (file-source log)
    docs.filter(F.col("doc_id") >= 250).write.mode("append").parquet(inp)
    run_curation_available_now(spark, inp, out, ckpt, _blocklist(spark))
    got2 = spark.read.parquet(out)
    assert got2.count() == docs.count()
    assert got2.select("doc_id").distinct().count() == docs.count()
