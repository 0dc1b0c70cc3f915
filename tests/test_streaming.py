"""Structured Streaming incremental extraction: resume + dedup semantics.

Mirrors the batch pipeline's invariants in streaming form: only new files
are processed on re-run (file-source log), duplicate urls are suppressed
across runs (dedup state), extracted text is byte-identical to the batch
kernel's output for the same input.
"""

from __future__ import annotations

import pathlib

from pyspark.sql import functions as F

from ocr_parallel_spark.pages import synthesize_pages
from ocr_parallel_spark.streaming.incremental import run_available_now


def test_incremental_extraction_resumes_and_dedups(spark, sf_dir, tmp_path):
    inp = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    inp.mkdir()

    # url-dup rows (doc_id % 10 == 9 reuse an earlier url) are excluded:
    # within one micro-batch dropDuplicates picks an arbitrary winner
    # (streaming keep-first = first ARRIVAL; batch keep-first by warc_ts
    # is the batch pipeline's job). Cross-batch suppression — the part
    # streaming owns — is what this test pins.
    pages = synthesize_pages(spark, sf_dir, with_expected=True).filter(
        F.col("doc_id") % 10 != 9
    )
    batch1 = pages.filter(F.col("doc_id") < 60)
    # batch2 overlaps batch1 on urls of docs 40..59 -> must be suppressed
    batch2 = pages.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 120))
    expected = {
        r.url: r.expected_text
        for r in pages.filter(F.col("doc_id") < 120)
        .select("url", "expected_text")
        .collect()
    }

    cols = ["url", "warc_ts", "html", "text", "lang"]
    batch1.select(cols).write.parquet(str(inp / "b1"))
    run_available_now(spark, f"{inp}/*", str(out), str(ckpt))
    n1 = spark.read.parquet(str(out)).count()
    urls1 = {
        r.url for r in spark.read.parquet(str(out)).select("url").collect()
    }

    batch2.select(cols).write.parquet(str(inp / "b2"))
    run_available_now(spark, f"{inp}/*", str(out), str(ckpt))
    result = spark.read.parquet(str(out))
    n2 = result.count()

    # run 2 added only rows whose url was not already emitted
    new_urls = {
        r.url
        for r in batch2.select("url").distinct().collect()
        if r.url not in urls1
    }
    assert n2 == n1 + len(new_urls)
    # no url appears twice across runs
    assert result.groupBy("url").count().filter("count > 1").count() == 0

    # byte-identical invariant holds through the streaming path
    got = {
        r.url: r.text
        for r in result.filter(F.col("status") != "error").collect()
    }
    for url, text in got.items():
        assert text == expected[url], url

    # third run with no new files is a no-op
    run_available_now(spark, f"{inp}/*", str(out), str(ckpt))
    assert spark.read.parquet(str(out)).count() == n2


def _last_state_rows(query) -> int:
    for p in reversed(query.recentProgress):
        ops = p.get("stateOperators") or []
        if ops:
            return ops[0]["numRowsTotal"]
    raise AssertionError("no stateOperators progress recorded")


def test_dedup_state_is_bounded_by_watermark_ttl(spark, sf_dir, tmp_path):
    """The url-dedup state store must not grow with every url ever seen:
    once the event-time watermark passes a url's warc_ts + TTL, its state
    row is evicted. Duplicates within the TTL stay suppressed."""
    inp = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    inp.mkdir()

    pages = synthesize_pages(spark, sf_dir, with_expected=False).filter(
        F.col("doc_id") % 10 != 9
    )
    cols = ["url", "warc_ts", "html", "text", "lang"]
    b1 = pages.filter(F.col("doc_id") < 40).select(cols)
    n_b1_urls = b1.select("url").distinct().count()
    b1.write.parquet(str(inp / "b1"))
    q1 = run_available_now(
        spark, f"{inp}/*", str(out), str(ckpt), dedup_ttl="2 minutes"
    )
    # all urls currently tracked (their warc_ts spread is < TTL)
    assert _last_state_rows(q1) == n_b1_urls

    # a row far in the future advances the watermark past every b1 url's
    # warc_ts + TTL -> their state rows are evicted, not retained forever.
    # Re-sent duplicates of b1 urls in the SAME batch (ts inside the new
    # watermark window would be late; use future ts) must still dedup
    # against each other.
    future = b1.limit(1).withColumn(
        "warc_ts", F.to_timestamp(F.lit("2026-06-01 00:00:00"))
    )
    future.write.parquet(str(inp / "b2"))
    q2 = run_available_now(
        spark, f"{inp}/*", str(out), str(ckpt), dedup_ttl="2 minutes"
    )
    assert _last_state_rows(q2) <= 1, "state not evicted: unbounded growth"


def test_windowed_rollup_batch_stream_equivalence(spark, sf_dir, tmp_path):
    """The streaming windowed sketch rollup must equal the SAME
    definition run in batch over the same rows: counts and HLL
    sketches are merge-order-independent, sums compared rounded
    (micro-batch boundaries change IEEE addition order). Incremental:
    two file drops + a watermark-advancing sentinel; append mode must
    emit every finalized window exactly once across drains."""
    import datetime

    from pyspark.sql import functions as F

    from ocr_parallel_spark.streaming.rollup import (
        run_rollup_available_now,
        windowed_user_stats,
    )

    inp, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    inp.mkdir()
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    kw = dict(window="1 day", watermark="2 days")

    # time-ordered drops (how crawl/event files actually land): rows
    # behind the established watermark would be DROPPED as late, so an
    # id-interleaved split would (correctly!) lose half the data
    split = datetime.datetime(2024, 1, 16)
    events.filter(F.col("ts") < F.lit(split)).write.parquet(str(inp / "b0"))
    run_rollup_available_now(spark, f"{inp}/*", str(out), str(ckpt), **kw)
    events.filter(F.col("ts") >= F.lit(split)).write.parquet(str(inp / "b1"))
    run_rollup_available_now(spark, f"{inp}/*", str(out), str(ckpt), **kw)
    # sentinel far past every real window + watermark: forces the
    # watermark beyond all real windows so they ALL finalize; its own
    # (still-open) window stays in state and never reaches the sink
    sentinel = spark.createDataFrame(
        [(10**9, datetime.datetime(2025, 6, 1), 1, "sentinel", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    sentinel.write.parquet(str(inp / "b2"))
    run_rollup_available_now(spark, f"{inp}/*", str(out), str(ckpt), **kw)

    got = spark.read.parquet(str(out))
    assert got.filter(F.col("event_type") == "sentinel").count() == 0
    key = ["win_start", "win_end", "event_type"]
    # append-once: no window emitted twice across the three drains
    assert got.groupBy(*key).count().filter("count > 1").count() == 0

    want = windowed_user_stats(events, window="1 day")
    a = sorted(
        (r.win_start, r.win_end, r.event_type, r.n_events, r.n_users_approx,
         round(r.sum_value, 6))
        for r in got.collect()
    )
    b = sorted(
        (r.win_start, r.win_end, r.event_type, r.n_events, r.n_users_approx,
         round(r.sum_value, 6))
        for r in want.collect()
    )
    assert a == b and len(a) > 10
