"""ocr_parallel_spark — PySpark-native main-content extraction engine.

A from-scratch rebuild of the data-processing semantics of
srm-ftw/ocr-parallel (a FastAPI + Gemini per-page OCR service) as an
idiomatic Spark batch engine over Common-Crawl-style page tables:
DataFrame/SQL logical plans, one Arrow-batched extraction kernel
(mapInArrow), built-in expressions everywhere else, snapshot-committed
resumable writes. See SURVEY.md for the full blueprint.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ocr_parallel_spark.config import (
    ARROW_MAX_RECORDS_PER_BATCH,
    DEFAULT_SHUFFLE_PARTITIONS,
)

__version__ = "0.1.0"


def get_spark(
    master: str | None = None,
    app_name: str = "ocr-parallel-spark",
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Session factory with the engine's execution profile.

    AQE on (runtime coalesce + skew-join split, north_rule skew handling),
    Arrow enabled with small batches (MB-scale html blobs), adaptive
    shuffle sizing. On a real cluster the same confs ship via
    ``spark-submit --conf``; master defaults to local[all cores] here.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
