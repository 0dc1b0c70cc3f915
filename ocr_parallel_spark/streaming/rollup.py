"""Windowed sketch rollups on an event stream (§2.10 + the sketch
statistics family on the streaming tier).

The batch `sketch_stats` query answers "distinct users / volume per
group" over a table; the streaming question is the same per EVENT-TIME
WINDOW as data drips in. One definition serves both tiers (the same
contract `curation.curate_docs` follows, equivalence pinned by test):
tumbling event-time windows, count + HLL++ distinct users + value sum,
with a watermark bounding the state store — a window's aggregation
state is dropped once the watermark passes its end, so state is
bounded by (watermark horizon / window size) windows per group instead
of growing forever. HLL++ is the part that makes this work at 100 TB:
its register state is tiny, mergeable, and order-independent, so
micro-batch merge order cannot change the answer.

Late rows beyond the watermark are dropped by the stream; the periodic
batch recompute over the committed table (the same definition, no
watermark) is the arbiter that picks them up — the standard two-tier
split used across this repo (see incremental.py's dedup note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-drip events source with the explicit schema (never infer —
    a streaming scan must not change shape when a weird file lands)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)


def windowed_user_stats(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Per (event_type, tumbling window): event count, HLL++ distinct
    users (rsd 0.05), value sum. Works on a streaming OR batch
    ``events`` frame unchanged; the watermark only attaches on the
    streaming side (batch sees every late row by definition).
    ``sum(value)`` is an IEEE double sum — batch/stream comparisons
    should round it (micro-batch boundaries change addition order);
    the counts and the HLL sketch are merge-order-independent."""
    e = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        e.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("approx_count_distinct(user_id, 0.05)").alias("n_users_approx"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
            "n_users_approx",
            "sum_value",
        )
    )


def run_rollup_available_now(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
):
    """Drain pending event files through the rollup and stop
    (availableNow). Append output mode: a window row is emitted ONCE,
    when the watermark passes its end — the sink only ever sees
    finalized windows, so downstream consumers never reconcile
    partial aggregates. Windows the watermark has not passed stay in
    the checkpoint state and emit on a later drain."""
    from ocr_parallel_spark.streaming.sink import drain_available_now

    return drain_available_now(
        windowed_user_stats(
            read_events_stream(spark, input_dir), window, watermark
        ),
        output_dir,
        checkpoint_dir,
    )
