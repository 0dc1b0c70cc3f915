"""Watermarked windows + applyInPandasWithState custom stateful operator."""

from __future__ import annotations

import datetime

from pyspark.sql import Window
from pyspark.sql import functions as F

from ocr_parallel_spark.streaming.stateful import (
    running_user_counts,
    windowed_lang_counts,
)

TS = datetime.datetime  # noqa: N816


def _write_pages(spark, path, rows):
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    df.write.mode("append").parquet(path)


def test_watermark_closes_windows_append_mode(spark, tmp_path):
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    h = bytearray(b"<p>x</p>")
    # hour 10 has 3 pages (2 en, 1 de); a 12:00 row pushes the watermark
    # past 11:00 so the 10:00 window closes and emits.
    _write_pages(spark, inp, [
        ("u1", TS(2026, 1, 1, 10, 5), h, "", "en"),
        ("u2", TS(2026, 1, 1, 10, 25), h, "", "en"),
        ("u3", TS(2026, 1, 1, 10, 45), h, "", "de"),
        ("u4", TS(2026, 1, 1, 12, 0), h, "", "en"),
    ])
    stream = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, html binary, text string, lang string"
        ).parquet(inp)
    )
    q = (
        windowed_lang_counts(stream, "1 hour", "10 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start.hour, r.lang): r.n_pages
        for r in spark.read.parquet(out).collect()
    }
    # only the closed hour-10 window emitted; hour-12 stays open in state
    assert got == {(10, "en"): 2, (10, "de"): 1}


def test_stateful_running_counts_survive_restart(spark, tmp_path):
    inp, out, ckpt = str(tmp_path / "ein"), str(tmp_path / "eout"), str(tmp_path / "eck")

    def write_events(rows):
        spark.createDataFrame(rows, "user_id bigint, event_id bigint").write.mode(
            "append"
        ).parquet(inp)

    def run():
        stream = spark.readStream.schema("user_id bigint, event_id bigint").parquet(inp)
        q = (
            running_user_counts(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_events([(1, 10), (1, 11), (2, 20)])
    run()
    write_events([(1, 12), (3, 30)])
    run()  # state recovered from checkpoint: user 1 continues at 2

    res = spark.read.parquet(out)
    latest = {
        r.user_id: (r.total_events, r.batches)
        for r in res.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("batches"))
            ),
        ).filter("rn = 1").collect()
    }
    assert latest[1] == (3, 2)  # 2 events in run 1 + 1 in run 2
    assert latest[2] == (1, 1)
    assert latest[3] == (1, 1)


def test_streaming_sequence_pack_matches_batch_and_survives_restart(
    spark, sf_dir, tmp_path
):
    """The stateful packer must (a) reproduce the batch q_sequence_pack
    offsets exactly when the stream delivers the same docs in the same
    order, and (b) continue offsets across a restart — the second run
    picks up each source's next_offset from the checkpoint."""
    from ocr_parallel_spark.queries_catalog import PACK_WINDOW, q_sequence_pack
    from ocr_parallel_spark.streaming.stateful import streaming_sequence_pack

    inp, out, ckpt = (
        str(tmp_path / "pin"),
        str(tmp_path / "pout"),
        str(tmp_path / "pck"),
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    mid = 250

    def run():
        stream = spark.readStream.schema(
            "doc_id bigint, source string, text string"
        ).parquet(inp)
        q = (
            streaming_sequence_pack(stream, PACK_WINDOW)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: first half (one file -> one micro-batch, doc_id-sorted inside)
    docs.filter(F.col("doc_id") < mid).coalesce(1).write.mode("append").parquet(inp)
    run()
    # run 2: second half appended; offsets must CONTINUE from the checkpoint
    docs.filter(F.col("doc_id") >= mid).coalesce(1).write.mode("append").parquet(inp)
    run()

    got = {
        r.doc_id: (r.n_tokens, r.tok_offset, r.win_start, r.win_end, r.is_split)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r.doc_id: (r.n_tokens, r.tok_offset, r.win_start, r.win_end, r.is_split)
        for r in q_sequence_pack(spark, sf_dir).collect()
    }
    assert len(got) == len(want) > 0
    assert got == want


def test_streaming_sequence_pack_survives_null_text(spark, tmp_path):
    """A NULL-text doc must pack as an empty-text doc (1 token after the
    coalesce, matching the batch twin) instead of NaN-poisoning every
    later offset in the micro-batch and killing the query."""
    from ocr_parallel_spark.streaming.stateful import streaming_sequence_pack

    inp, out, ckpt = (
        str(tmp_path / "nin"),
        str(tmp_path / "nout"),
        str(tmp_path / "nck"),
    )
    spark.createDataFrame(
        [(1, "s", "one two three"), (2, "s", None), (3, "s", "four five")],
        "doc_id long, source string, text string",
    ).coalesce(1).write.parquet(inp)
    q = (
        streaming_sequence_pack(
            spark.readStream.schema(
                "doc_id bigint, source string, text string"
            ).parquet(inp),
            8,
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert rows[2].n_tokens == 1 and rows[2].tok_offset == 3
    assert rows[3].tok_offset == 4


def test_streaming_near_dup_matches_batch_and_survives_restart(spark, tmp_path):
    """Streaming MinHash near-dup == the batch signature-estimate twin
    on identical (ascending doc_id) arrivals, INCLUDING cross-batch
    pairs whose earlier member arrived before a restart: the band
    state (ids + signatures) lives in the checkpointed state store."""
    from ocr_parallel_spark.operators.neardup import (
        signature_near_dup_marks,
        with_minhash_sigs,
    )
    from ocr_parallel_spark.streaming.stateful import streaming_near_dup

    inp, out, ckpt = (
        str(tmp_path / "nin"),
        str(tmp_path / "nout"),
        str(tmp_path / "nck"),
    )
    base = "the quick brown fox jumps over the lazy dog near the river bank " * 6
    other = (
        "completely unrelated subject matter about astronomy telescopes "
        "planets orbits and the mathematics of celestial navigation " * 6
    )
    chunk1 = [
        (1, base + "alpha ending"),
        (2, other),
        (3, base + "bravo ending"),  # near-dup of 1, same batch
    ]
    chunk2 = [
        (4, base + "charlie ending"),  # near-dup of 1, ACROSS the restart
        (5, "short odd text unlike anything else entirely"),
    ]

    def write(rows):
        spark.createDataFrame(rows, "doc_id long, text string").write.mode(
            "append"
        ).parquet(inp)

    def run():
        stream = spark.readStream.schema("doc_id long, text string").parquet(inp)
        q = (
            streaming_near_dup(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write(chunk1)
    run()
    write(chunk2)
    run()  # fresh query object, same checkpoint -> state restored

    got: dict = {}
    for r in spark.read.parquet(out).collect():
        got[r.doc_id] = min(got.get(r.doc_id, r.near_rep), r.near_rep)

    docs = spark.createDataFrame(chunk1 + chunk2, "doc_id long, text string")
    expect = {
        r.doc_id: r.near_rep
        for r in signature_near_dup_marks(
            with_minhash_sigs(docs, "text", "doc_id")
        ).collect()
        if r.is_near_dup
    }
    assert got == expect
    assert expect.get(3) == 1 and expect.get(4) == 1  # incl. the cross-restart pair
    assert 2 not in expect and 5 not in expect


def test_streaming_sem_dedup_matches_batch_and_survives_restart(spark, tmp_path):
    """Streaming SemDedup == the batch semdedup_marks twin (same
    pretrained centroids) on ascending-id arrivals, INCLUDING a twin
    whose earlier member arrived before a restart — the cell state
    (ids, packed vectors, norms) lives in the checkpointed store."""
    from ocr_parallel_spark.functions.similarity import (
        kmeans_centroids,
        semdedup_marks,
    )
    from ocr_parallel_spark.streaming.stateful import streaming_sem_dedup

    inp, out, ckpt = (
        str(tmp_path / "sin"),
        str(tmp_path / "sout"),
        str(tmp_path / "sck"),
    )
    dim = 16

    def vec(kind, jitter):
        if kind == "a":
            return [100.0 + jitter, 1.0] + [0.0] * (dim - 2)
        if kind == "b":
            return [0.0, 0.0, 80.0, jitter] + [0.0] * (dim - 4)
        return [0.0] * 8 + [float(jitter) + 5.0] + [0.0] * (dim - 9)

    chunk1 = [
        (1, vec("a", 0.0)),
        (2, vec("b", 0.0)),
        (3, vec("a", 0.5)),       # sem twin of 1, same batch
        (4, vec("c", 1.0)),       # singleton
    ]
    chunk2 = [
        (5, vec("a", 1.0)),       # sem twin of 1, ACROSS the restart
        (6, vec("b", 0.3)),       # sem twin of 2, across the restart
    ]
    schema = "doc_id long, embedding array<double>"
    all_docs = spark.createDataFrame(chunk1 + chunk2, schema)
    cents = kmeans_centroids(all_docs, n_cells=3, id_col="doc_id")

    def write(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(inp)

    def run():
        stream = spark.readStream.schema(schema).parquet(inp)
        q = (
            streaming_sem_dedup(stream, cents, 0.9)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write(chunk1)
    run()
    write(chunk2)
    run()  # fresh query object, same checkpoint -> state restored

    got = {r.doc_id: r.sem_rep for r in spark.read.parquet(out).collect()}
    expect = {
        r.vec_id: r.dup_of
        for r in semdedup_marks(
            all_docs.withColumnRenamed("doc_id", "vec_id"), cents, 0.9
        ).collect()
        if r.is_sem_dup
    }
    assert got == expect
    assert expect.get(3) == 1 and expect.get(5) == 1 and expect.get(6) == 2
    assert 1 not in expect and 2 not in expect and 4 not in expect


def test_streaming_sem_dedup_skips_null_embeddings(spark, tmp_path):
    """A NULL-embedding row passes through the batch twin unmarked; the
    stream must skip it rather than kill the query."""
    from ocr_parallel_spark.functions.similarity import kmeans_centroids
    from ocr_parallel_spark.streaming.stateful import streaming_sem_dedup

    inp, out, ckpt = (
        str(tmp_path / "nin"), str(tmp_path / "nout"), str(tmp_path / "nck")
    )
    schema = "doc_id long, embedding array<double>"
    rows = [
        (1, [50.0, 1.0] + [0.0] * 14),
        (2, None),
        (3, [50.0, 1.5] + [0.0] * 14),  # twin of 1
    ]
    df = spark.createDataFrame(rows, schema)
    cents = kmeans_centroids(df.filter("embedding IS NOT NULL"),
                             n_cells=1, id_col="doc_id")
    df.write.parquet(inp)
    q = (
        streaming_sem_dedup(
            spark.readStream.schema(schema).parquet(inp), cents, 0.9
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.doc_id: r.sem_rep for r in spark.read.parquet(out).collect()}
    assert got == {3: 1}


def test_round4_half_up_matches_spark_round(spark):
    """The streaming SemDedup threshold comparison must round exactly as
    the batch twin's F.round(col, 4): Java HALF_UP over the double's
    shortest decimal repr. Python's built-in round() diverges on
    decimal-repr boundaries (0.90025 -> 0.9002 built-in, 0.9003 Spark)
    and exact binary ties (0.03125 -> 0.0312 vs 0.0313); pin the helper
    against Spark itself across hand-picked boundaries plus a dense
    sweep around the default 0.9 threshold."""
    from pyspark.sql import functions as F

    from ocr_parallel_spark.streaming.stateful import _round4_half_up

    vals = [0.90025, 0.90015, 0.03125, 0.89995, 0.9, 0.0, 1.0,
            0.99995, 0.00005, 0.12344999, 0.123450001, -0.90025]
    vals += [k / 200000.0 for k in range(179980, 180021)]  # 0.8999..0.90011
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, x double"
    )
    got = {
        r.i: r.r
        for r in df.select("i", F.round("x", 4).alias("r")).collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == _round4_half_up(v), (v, got[i], _round4_half_up(v))


def test_streaming_sequence_pack_drops_redelivered_docs(spark, tmp_path):
    """An at-least-once source that re-delivers a doc (and a micro-batch
    containing the same doc twice) must pack it ONCE: a second emission
    would permanently shift every later offset in the source. Offsets
    must equal a batch pack over the distinct docs."""
    from ocr_parallel_spark.streaming.stateful import streaming_sequence_pack

    inp, out, ckpt = (
        str(tmp_path / "rin"),
        str(tmp_path / "rout"),
        str(tmp_path / "rck"),
    )
    schema = "doc_id bigint, source string, text string"

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(inp)

    def run():
        stream = spark.readStream.schema(schema).parquet(inp)
        q = (
            streaming_sequence_pack(stream, 4)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: docs 1 (3 tokens) and 2 (2 tokens), doc 2 duplicated
    # WITHIN the batch
    write([(1, "s", "a b c"), (2, "s", "d e"), (2, "s", "d e")])
    run()
    # run 2: doc 2 re-delivered ACROSS batches + genuinely new doc 3
    write([(2, "s", "d e"), (3, "s", "f g h i")])
    run()

    got = {
        r.doc_id: (r.n_tokens, r.tok_offset)
        for r in spark.read.parquet(out).collect()
    }
    n_rows = spark.read.parquet(out).count()
    assert n_rows == 3, f"re-delivered doc packed twice: {n_rows} rows"
    assert got[1] == (3, 0)
    assert got[2] == (2, 3)
    assert got[3] == (4, 5), "offset drifted: re-delivery advanced the stream"
