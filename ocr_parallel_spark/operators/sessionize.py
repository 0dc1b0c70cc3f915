"""Dense-range grouping / sessionization (SURVEY §2.5 A8).

Reference semantics (/root/reference/app/utils/text_localization.py:646-680):
scan a sorted int list, break a run whenever the gap to the previous element
exceeds 3, then keep the densest run. The classic lag + cumulative-sum
session trick expresses this as two window passes — no Python, one shuffle
on the partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ocr_parallel_spark.config import DENSE_RANGE_GAP


def sessionize(
    df: DataFrame,
    part_col: str,
    order_col: str,
    gap: int = DENSE_RANGE_GAP,
) -> DataFrame:
    """Assign a session_id per (part, run) where a run breaks when
    order_col gaps by more than ``gap``. Returns input + session_id."""
    w = Window.partitionBy(part_col).orderBy(order_col)
    flagged = df.withColumn(
        "_gap_flag",
        F.when(
            F.col(order_col) - F.lag(order_col).over(w) > gap, 1
        ).otherwise(0),
    )
    return flagged.withColumn(
        "session_id", F.sum("_gap_flag").over(w)
    ).drop("_gap_flag")


def densest_range(
    df: DataFrame,
    part_col: str,
    order_col: str,
    gap: int = DENSE_RANGE_GAP,
) -> DataFrame:
    """A8 proper: the most-populated run per partition (first by count,
    ties broken by earliest start — matching the reference's strict ``>``
    comparison which keeps the earlier run on ties,
    text_localization.py:662-673)."""
    sess = sessionize(df, part_col, order_col, gap)
    runs = sess.groupBy(part_col, "session_id").agg(
        F.count(F.lit(1)).alias("run_count"),
        F.min(order_col).alias("run_start"),
        F.max(order_col).alias("run_end"),
    )
    w = Window.partitionBy(part_col).orderBy(
        F.col("run_count").desc(), F.col("run_start").asc()
    )
    return (
        runs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
