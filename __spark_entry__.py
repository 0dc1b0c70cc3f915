"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline on sf0.001.
``queries()`` / ``oracle_sql()`` expose each implemented operator from
SURVEY.md §2 with a DuckDB-equivalent oracle; both sides alias computed
columns identically so the driver's order-insensitive value-hash matches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesized CC-style pages table -> extraction pipeline
    (keep-first dedup -> Arrow kernel -> content dedup -> near-dup mark)."""
    from ocr_parallel_spark.pages import synthesize_pages
    from ocr_parallel_spark.pipeline import run_extraction_pipeline

    pages = synthesize_pages(spark, SF0001).drop("doc_id")
    return run_extraction_pipeline(pages)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ocr_parallel_spark import queries_catalog

    return queries_catalog.queries()


def oracle_sql() -> dict[str, str]:
    from ocr_parallel_spark import queries_catalog

    return queries_catalog.oracle_sql()
