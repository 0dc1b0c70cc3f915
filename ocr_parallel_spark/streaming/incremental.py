"""Incremental extraction as a Structured Streaming job.

The reference's only "streaming" is HTTP request batches + a background
job poll (X9, /root/reference/app/api/endpoints/full_process.py:60-152).
The web-scale analog is a drip of new crawl files landing in a directory /
table. This module expresses that as Structured Streaming:

- ``readStream`` over the pages directory (explicit schema — never infer),
- **stateful, bounded** url dedup with ``withWatermark`` +
  ``dropDuplicatesWithinWatermark`` (streaming keep-first: the first
  *arrival* wins; state lives in the checkpoint, so duplicates are
  suppressed across restarts, not just within a micro-batch; state for a
  url is EVICTED once the event-time watermark passes its ``warc_ts`` +
  TTL, so the state store is bounded by the crawl's re-fetch horizon
  instead of growing with every url ever seen — at CC scale an unbounded
  ``dropDuplicates`` checkpoint dies. A re-crawl landing after the TTL
  re-emits; the batch compaction pass over the committed table
  (pipeline.py keep-first-by-warc_ts) is the deterministic global
  arbiter either way, including for ties WITHIN one micro-batch),
- the same Arrow extraction kernel (``mapInArrow`` is streaming-safe: one
  batch function, no global state),
- parquet append sink + checkpoint; ``Trigger.AvailableNow`` drains
  everything pending and stops — the idiomatic "resumable batch" trigger.

Exact/near content dedup are deliberately NOT in the stream: marking (not
dropping) duplicates needs a global view, which is the batch compaction
pass over the committed table (pipeline.py + io.snapshot). Streaming
handles ingest identity (url), batch handles content identity — the
standard two-tier design for CC-scale pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ocr_parallel_spark.config import MAX_PAYLOAD_BYTES
from ocr_parallel_spark.operators.classify import classify_status, filter_oversized
from ocr_parallel_spark.operators.extraction import extract_pages

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def read_pages_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )


def incremental_extraction(
    pages_stream: DataFrame,
    max_bytes: int = MAX_PAYLOAD_BYTES,
    dedup_ttl: str = "30 days",
) -> DataFrame:
    """Streaming plan: size cap -> bounded stateful url dedup -> Arrow
    kernel -> status classify. Returns the streaming DataFrame to sink.

    ``dedup_ttl`` is the event-time horizon within which a re-fetched url
    is suppressed; state older than the watermark minus TTL is evicted
    (bounded state store). Pick it >= the crawler's re-visit interval."""
    capped = filter_oversized(pages_stream, "html", max_bytes)
    deduped = capped.withWatermark(
        "warc_ts", dedup_ttl
    ).dropDuplicatesWithinWatermark(["url"])
    extracted = extract_pages(deduped, "html", ("url", "warc_ts", "lang"))
    return extracted.withColumn(
        "status",
        F.when(F.col("status") == "error", F.lit("error")).otherwise(
            classify_status("text")
        ),
    )


def run_available_now(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_bytes: int = MAX_PAYLOAD_BYTES,
    dedup_ttl: str = "30 days",
):
    """Drain all currently-available input files into the output table and
    stop. Re-running after new files land processes ONLY the new files
    (file-source log) and suppresses already-seen urls within the TTL
    (bounded dedup state) — both recovered from the checkpoint. Returns
    the finished query (for state-store metrics via ``recentProgress``)."""
    from ocr_parallel_spark.streaming.sink import drain_available_now

    out = incremental_extraction(
        read_pages_stream(spark, input_dir), max_bytes, dedup_ttl
    )
    return drain_available_now(out, output_dir, checkpoint_dir)
