"""End-to-end test of the curation batch job: docs -> screens -> line
dedup -> exact dup on cleaned text -> decontamination -> snapshot commit
with resume (second run over the same input is a no-op)."""

from __future__ import annotations

import importlib.util
import pathlib

from pyspark.sql import functions as F

from ocr_parallel_spark.io.snapshot import SnapshotTable, run_resumable

_spec = importlib.util.spec_from_file_location(
    "job_curate",
    pathlib.Path(__file__).resolve().parent.parent / "scripts" / "job_curate.py",
)
job = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(job)


def _docs(spark, sf_dir):
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


def test_curate_job_end_to_end_and_resume(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    blocked = spark.createDataFrame([("site-3.example.com",)], "host string")
    bench = docs.filter(F.col("doc_id") % 50 == 7).select("text")

    out = job.build_output(spark, docs, blocked, bench)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == docs.count()
    reasons = {r["drop_reason"] for r in rows.values()}
    assert "blocked" in reasons and "contaminated" in reasons
    # blocklist screen outranks content reasons; bench docs on allowed
    # hosts carry the contamination flag
    for r in rows.values():
        if r["host"] == "site-3.example.com":
            assert r["drop_reason"] == "blocked"
        if r["doc_id"] % 50 == 7:
            assert r["contaminated"]
    assert sum(1 for r in rows.values() if r["kept"]) > 0

    # snapshot resume: first run commits everything, second is a no-op
    table = SnapshotTable(str(tmp_path / "verdicts"))
    snap1 = run_resumable(
        docs, table, spark,
        lambda todo: job.build_output(spark, todo, blocked, bench),
        key_col="doc_id",
    )
    assert snap1["lineage"]["rows_written"] == docs.count()
    snap2 = run_resumable(
        docs, table, spark,
        lambda todo: job.build_output(spark, todo, blocked, bench),
        key_col="doc_id",
    )
    assert snap2.get("noop") is True


def test_curate_job_real_newline_docs_use_line_granularity(spark):
    """Docs WITH newlines dedup on their real lines: a banner line shared
    by >= min_count docs is stripped, content survives."""
    rows = [
        (i, f"https://h{i}.org/x", f"COOKIE BANNER\ncontent {i} unique", "en", "s")
        for i in range(6)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, url string, text string, lang string, source string"
    )
    out = job.build_output(spark, docs, None, None, min_line_count=5)
    got = {r["doc_id"]: r for r in out.collect()}
    for i in range(6):
        assert got[i]["n_kept_lines"] == 1
