"""Scale-adaptive scan fan-out (optimization guide §2.2/§6).

A parquet scan yields one task per ``maxPartitionBytes`` split; a small
file therefore yields FEWER scan tasks than the machine has cores, and
every expression/Arrow stage pipelined onto the scan runs on that
handful of tasks while the rest of the box idles. At the sandbox's
benchmark scale ``documents.parquet`` is a single sub-split file, so the
whole catalog's per-row work — span hashing, n-gram explodes, MinHash
batches — was running on ONE core of 32.

``fan_out`` fixes the shape adaptively instead of with a constant: when
(and only when) the frame's planned partition count is below the
session's ``defaultParallelism``, it round-robin repartitions to that
parallelism. At production scale a 100 TB table scans as thousands of
splits, the condition is false, and the call is a zero-cost no-op — no
constant tuned to either environment (the round-6 rule). Round-robin
``repartition(n)`` is retry-safe (Spark sorts before repartition,
SPARK-23207) and every catalog consumer is order-insensitive.

The partition probe (``df.rdd.getNumPartitions()``) only compiles the
physical plan — no job runs; for a scan it is the file-split count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session's core count iff its planned
    partitioning would leave cores idle. No-op (and no exchange) when
    the scan already fans wide — i.e. at any realistic corpus size."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
