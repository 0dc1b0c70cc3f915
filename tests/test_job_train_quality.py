"""Quality-training job: fit ternary votes from a labeled corpus with a
held-out floor check; weights feed job_curate --quality-weights."""

from __future__ import annotations

import importlib.util
import pathlib

import pytest
from pyspark.sql import functions as F

_spec = importlib.util.spec_from_file_location(
    "job_train_quality",
    pathlib.Path(__file__).resolve().parent.parent
    / "scripts"
    / "job_train_quality.py",
)
job = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(job)


def _labeled(spark, sf_dir):
    from ocr_parallel_spark.functions.curation import QT_TAINTS

    taint = F.when(
        F.col("doc_id") % 3 == 0, F.lit(" " + QT_TAINTS["mojibake"])
    ).otherwise(F.lit(""))
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            F.concat(F.col("text"), taint).alias("text"),
            (F.col("doc_id") % 3 == 0).alias("label_low"),
        )
    )


def test_fit_passes_floor_and_weights_drive_the_screen(spark, sf_dir, tmp_path):
    labeled = _labeled(spark, sf_dir)
    w, metrics = job.fit_and_eval(spark, labeled, 5, 900)
    assert metrics["prec_milli"] >= 900 and metrics["rec_milli"] >= 900
    assert metrics["fp"] == 0
    rows = w.collect()
    assert 0 < len(rows) < 1024 and all(r["_wt"] in (-1, 1) for r in rows)
    # round-trip through parquet, the hand-off format job_curate reads
    path = str(tmp_path / "w.parquet")
    w.write.parquet(path)
    again = {r["_bucket"]: r["_wt"] for r in spark.read.parquet(path).collect()}
    assert again == {r["_bucket"]: r["_wt"] for r in rows}


def test_fit_refuses_garbage_labels(spark, sf_dir):
    """Labels carrying no signal (here: a hash split uncorrelated with
    any text feature) must fail the floor check loudly instead of
    shipping a random filter."""
    garbage = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            "text",
            (F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0).alias("label_low"),
        )
    )
    with pytest.raises(SystemExit, match="below floor"):
        job.fit_and_eval(spark, garbage, 5, 900)


def test_fit_no_eval_mode(spark, sf_dir):
    w, metrics = job.fit_and_eval(spark, _labeled(spark, sf_dir), None, 900)
    assert metrics == {} and w.count() > 0
