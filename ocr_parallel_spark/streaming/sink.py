"""Shared availableNow parquet sink for the streaming run_* helpers.

One definition of the drain-and-stop contract (parquet sink, checkpoint,
append mode, availableNow trigger) instead of a copy per module — the
three run_* helpers had already drifted on their return value before
this existed."""

from __future__ import annotations

from pyspark.sql import DataFrame


def drain_available_now(df: DataFrame, output_dir: str, checkpoint_dir: str):
    """Write ``df`` to a parquet table until the source is drained, then
    stop (availableNow trigger). Append output mode — every streaming
    operator here emits final rows only. Returns the finished query so
    callers can read state-store metrics via ``recentProgress``."""
    q = (
        df.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
