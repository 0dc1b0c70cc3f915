"""Order-preserving map-back join (SURVEY §2.3 J1 + §2.6 W5).

Reference semantics (/root/reference/app/utils/deduplication.py:64-95 with
the mapping built :24-61): every original input position re-attaches to the
result computed for its unique key, preserving input order. In Spark that
is an equi left-join of the full input against the deduped results —
broadcast-friendly because the unique side shrank — with order restored by
the carried input index, never by arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_input_idx(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """Explicit input index from a deterministic sort key (the reference's
    enumerate(); monotonically_increasing_id is partition-dependent so a
    semantic order column is required for cross-run determinism)."""
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn("input_idx", F.row_number().over(w) - 1)


def representative(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """For every row, the id of its keep-first representative (min id per
    key — the insertion-order-first analog)."""
    w = Window.partitionBy(*key_cols)
    return df.withColumn("rep_id", F.min(id_col).over(w))


def map_back(
    inputs: DataFrame,
    unique_results: DataFrame,
    key_cols: list[str],
    broadcast_results: bool = True,
) -> DataFrame:
    """J1: left-join inputs against per-key results. Missing keys survive
    as NULL result columns (the reference backfills error rows,
    deduplication.py:85-95 — callers classify NULLs downstream)."""
    right = F.broadcast(unique_results) if broadcast_results else unique_results
    return inputs.join(right, on=key_cols, how="left")
