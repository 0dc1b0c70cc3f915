"""Event-time windows, watermarks, and custom stateful streaming operators.

Completes the Structured Streaming surface beyond ingest (incremental.py):

- ``windowed_lang_counts``: tumbling event-time window over ``warc_ts``
  with a watermark — the streaming analog of the reference's batch metric
  rollups (A1/A5), with late data handled by the watermark instead of a
  re-run. Append mode: a window emits exactly once, when the watermark
  passes its end.
- ``running_user_counts``: custom stateful operator via
  ``applyInPandasWithState`` — per-key running totals that survive
  restarts through the checkpoint (the streaming analog of the
  reference's per-batch accumulator loops, e.g. full_process_orchestrator
  stats). This is the extension point for custom session/rollup logic
  that built-in windows can't express.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_lang_counts(
    pages_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Pages per (event-time window, lang). Late rows older than the
    watermark are dropped; in append output mode each window emits once,
    after the watermark passes its end."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
        )
    )


_OUT_SCHEMA = "user_id bigint, total_events bigint, batches int"
_STATE_SCHEMA = "total bigint, batches int"


def _update_counts(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n = 0
    for pdf in pdfs:
        n += len(pdf)
    if state.exists:
        total, batches = state.get
    else:
        total, batches = 0, 0
    total += n
    batches += 1
    state.update((total, batches))
    yield pd.DataFrame(
        {"user_id": [key[0]], "total_events": [total], "batches": [batches]}
    )


def running_user_counts(events_stream: DataFrame) -> DataFrame:
    """Per-user running event counts as a custom stateful operator: state
    (total, batches) lives in the state store, recovered from the
    checkpoint across restarts. One row per key per micro-batch that saw
    the key; append operator mode (emitted rows are final) so the file
    sink — which only supports append — can take them."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_counts,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
