"""Streaming-tier curation: the same curate_docs definition must produce
identical results in a micro-batch stream and in batch (the two-tier
contract of streaming/curation.py), and restart must process only new
files."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs_with_urls(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn(
            "url",
            F.concat(
                F.lit("https://site-"),
                (F.col("doc_id") % 7).cast("string"),
                F.lit(".example.com/p/"),
                F.col("doc_id").cast("string"),
            ),
        )
        .select("doc_id", "url", "text", "lang", "source")
    )


def _blocklist(spark):
    return spark.createDataFrame(
        [("site-3.example.com",), ("site-5.example.com",)], "host string"
    )


def test_stream_batch_equivalence_and_resume(spark, sf_dir, tmp_path):
    from ocr_parallel_spark.streaming.curation import (
        curate_docs,
        run_curation_available_now,
    )

    docs = _docs_with_urls(spark, sf_dir)
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs.filter(F.col("doc_id") < 250).write.parquet(inp)

    run_curation_available_now(spark, inp, out, ckpt, _blocklist(spark))
    got1 = spark.read.parquet(out)
    assert got1.count() == 250

    # identical to running the SAME definition in batch
    want = curate_docs(docs.filter(F.col("doc_id") < 250), _blocklist(spark))
    sort_cols = ["doc_id"]
    assert (
        got1.orderBy(*sort_cols).collect() == want.orderBy(*sort_cols).collect()
    )
    # blocked hosts dropped with precedence over every content reason
    blocked = got1.filter(F.col("host").isin("site-3.example.com", "site-5.example.com"))
    assert blocked.count() > 0
    assert blocked.filter(F.col("drop_reason") != "blocked").count() == 0

    # restart: only the new file is processed (file-source log)
    docs.filter(F.col("doc_id") >= 250).write.mode("append").parquet(inp)
    run_curation_available_now(spark, inp, out, ckpt, _blocklist(spark))
    got2 = spark.read.parquet(out)
    assert got2.count() == docs.count()
    assert got2.select("doc_id").distinct().count() == docs.count()


def test_trained_quality_screen_stream_equals_batch(spark, sf_dir, tmp_path):
    """The stateless vote-map screen equals the batch explode+agg
    scorer doc-for-doc, and the SAME definition runs unchanged over a
    stream (availableNow drain) with identical verdicts."""
    from ocr_parallel_spark.functions.curation import (
        QT_TAINTS,
        train_quality_weights,
        trained_quality_scores,
    )
    from ocr_parallel_spark.operators.classify import normalize_col
    from ocr_parallel_spark.streaming.curation import (
        DOCS_SCHEMA,
        quality_screen_docs,
    )

    taint = F.when(
        F.col("doc_id") % 3 == 0, F.lit(" " + QT_TAINTS["lorem"])
    ).otherwise(F.lit(""))
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 150)
        .select(
            "doc_id",
            F.concat(F.lit("https://h.example.com/"), F.col("doc_id")).alias("url"),
            F.concat(F.col("text"), taint).alias("text"),
            "lang",
            "source",
        )
    )
    w = train_quality_weights(
        docs.select(
            normalize_col("text").alias("norm"),
            (F.col("doc_id") % 3 == 0).alias("label_low"),
        )
    )
    weights = {r["_bucket"]: r["_wt"] for r in w.collect()}
    # batch: map-expression screen == explode+agg scorer
    batch = {
        r.doc_id: (r.score, r.low_quality)
        for r in quality_screen_docs(docs, weights).collect()
    }
    ref = {
        r.doc_id: r.score
        for r in trained_quality_scores(
            docs.select("doc_id", normalize_col("text").alias("norm")), w
        ).collect()
    }
    assert {k: v[0] for k, v in batch.items()} == ref
    assert all(v[1] == (k % 3 == 0) for k, v in batch.items())
    # stream: same definition over an availableNow drain
    inp, out, ckpt = str(tmp_path / "qin"), str(tmp_path / "qout"), str(tmp_path / "qck")
    docs.write.mode("append").parquet(inp)
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(inp)
    q = (
        quality_screen_docs(stream, weights)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        r.doc_id: (r.score, r.low_quality)
        for r in spark.read.parquet(out).collect()
    }
    assert streamed == batch


def test_lm_screen_stream_equals_batch(spark, sf_dir, tmp_path):
    """The closure-shipped Arrow LM scorer equals the batch
    explode+broadcast-join doc_surprise doc-for-doc (n_grams,
    sum_surprise, surprise_x16 all exact), flags exactly the
    over-threshold docs, and the SAME definition runs unchanged over
    an availableNow stream with identical verdicts."""
    from ocr_parallel_spark.functions.curation import QT_TAINTS
    from ocr_parallel_spark.functions.lm import (
        doc_surprise,
        fit_trigram_lm,
        model_to_dict,
    )
    from ocr_parallel_spark.operators.classify import normalize_col
    from ocr_parallel_spark.streaming.curation import (
        DOCS_SCHEMA,
        lm_screen_docs,
    )

    taint = F.when(
        F.col("doc_id") % 3 == 0, F.lit(" " + QT_TAINTS["mojibake"])
    ).otherwise(F.lit(""))
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 150)
        .select(
            "doc_id",
            F.concat(F.lit("https://h.example.com/"), F.col("doc_id")).alias("url"),
            F.concat(F.col("text"), taint).alias("text"),
            "lang",
            "source",
        )
    )
    ref = docs.filter(F.col("doc_id") % 3 != 0)
    model_df = fit_trigram_lm(
        ref.select(normalize_col("text").alias("norm"))
    )
    model = model_to_dict(model_df)
    assert len(model) > 0

    batch_ref = {
        r.doc_id: (r.n_grams, r.sum_surprise, r.surprise_x16)
        for r in doc_surprise(
            docs.select("doc_id", normalize_col("text").alias("norm")),
            model_df,
        ).collect()
    }
    screened = {
        r.doc_id: r for r in lm_screen_docs(docs, model, 300).collect()
    }
    assert {
        d: (r.n_grams, r.sum_surprise, r.surprise_x16)
        for d, r in screened.items()
    } == batch_ref
    for d, r in screened.items():
        assert r.high_surprise == (
            r.surprise_x16 is not None and r.surprise_x16 > 300
        )
    assert any(r.high_surprise for r in screened.values())
    assert any(
        not r.high_surprise and r.surprise_x16 is not None
        for r in screened.values()
    )

    # stream: same definition over an availableNow drain
    inp, out, ckpt = (
        str(tmp_path / "lin"),
        str(tmp_path / "lout"),
        str(tmp_path / "lck"),
    )
    docs.write.mode("append").parquet(inp)
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(inp)
    q = (
        lm_screen_docs(stream, model, 300)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        r.doc_id: (r.n_grams, r.sum_surprise, r.surprise_x16, r.high_surprise)
        for r in spark.read.parquet(out).collect()
    }
    assert streamed == {
        d: (r.n_grams, r.sum_surprise, r.surprise_x16, r.high_surprise)
        for d, r in screened.items()
    }


def test_blocklist_duplicates_do_not_fan_verdicts(spark, sf_dir):
    """A blocklist whose rows collide after lowercasing ('Site-3...' +
    'site-3...') must still yield exactly ONE verdict row per doc — the
    broadcast side dedups post-normalization, or the left join would
    emit every doc on that host once per colliding row."""
    from ocr_parallel_spark.streaming.curation import curate_docs

    docs = _docs_with_urls(spark, sf_dir)
    messy = spark.createDataFrame(
        [("Site-3.example.com",), ("site-3.example.com",),
         ("SITE-3.EXAMPLE.COM",)],
        "host string",
    )
    out = curate_docs(docs, messy)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    blocked = out.filter("drop_reason = 'blocked'")
    assert blocked.count() > 0
    assert set(
        r.host for r in blocked.select("host").distinct().collect()
    ) == {"site-3.example.com"}
