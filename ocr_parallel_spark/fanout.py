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

The partition probe (``df.rdd.getNumPartitions()``) is free for a bare
scan chain (plan compilation only), but under AQE it EXECUTES query
stages when the plan already contains an exchange or a broadcast build
— a thrown-away job inside the timed region (round-6 review finding,
confirmed experimentally). ``fan_out`` therefore probes only plans that
are plain scan->filter->project chains; anything with a join, window,
aggregate, or existing repartition is returned unchanged — such frames
either already carry shuffle parallelism or were fanned upstream.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# Logical operators whose presence makes the partition probe expensive
# (AQE materializes stages) or the fan-out redundant (the operator
# itself re-establishes parallelism via its shuffle).
_COMPLEX_NODE = re.compile(
    r"\b(Join|Repartition|RepartitionByExpression|Rebalance|Window|"
    r"Aggregate|Generate|LogicalRDD|Union)\b"
)


def fan_out(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session's core count iff it is a simple
    scan whose planned partitioning would leave cores idle. No-op (and
    no exchange) when the scan already fans wide — i.e. at any
    realistic corpus size — and for non-scan plans (see module doc)."""
    if _COMPLEX_NODE.search(df._jdf.queryExecution().analyzed().toString()):
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
