"""CCNet-style trigram-LM surprise filter (functions/lm.py).

Hand-computed fit/score laws on a tiny corpus, edge cases the oracle's
corpus never exercises (short docs, NULL text, the unseen cap), and the
measured-separation gate on the real taint benchmark.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_parallel_spark.functions.lm import (
    LM_UNSEEN_BITS,
    doc_surprise,
    fit_trigram_lm,
    trigram_positions,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, norm string")


def test_trigram_positions_edges(spark):
    """Docs with < 3 tokens (including NULL text) emit zero positions;
    a 3-token doc emits exactly one interior gram."""
    d = _df(
        spark,
        [(1, None), (2, ""), (3, "a"), (4, "a b"), (5, "a b c"),
         (6, "a b c d")],
    )
    pos = trigram_positions(d).collect()
    by_doc: dict = {}
    for r in pos:
        by_doc.setdefault(r.doc_id, []).append((r.gram, r.ctx))
    assert set(by_doc) == {5, 6}
    assert by_doc[5] == [("a b c", "a b")]
    assert sorted(by_doc[6]) == [("a b c", "a b"), ("b c d", "b c")]


def test_fit_hand_computed(spark):
    """Counts replayed by hand: gram 'a b c' appears 3x (ctx 'a b' total
    3) -> surprise bitlen(3)-bitlen(3)+1 = 1; every singleton gram is
    pruned away."""
    ref = _df(spark, [(1, "a b c a b c"), (2, "a b c d")])
    model = {r.gram: r.surprise for r in fit_trigram_lm(ref).collect()}
    assert model == {"a b c": 1}


def test_fit_surprise_contrast_and_cap(spark):
    """A gram carrying 1-of-8 of its context's mass costs
    bitlen(8)-bitlen(1)+1 = 4 bits; the unseen parameter caps in-model
    surprise too (unseen must never be cheaper than seen)."""
    # ctx "a b": gram "a b c" x7 + "a b d" x1 -> c2=8
    rows = [(i, "a b c") for i in range(7)] + [(7, "a b d")]
    # repeat "a b d" once more so it survives min_count=2
    rows += [(8, "a b d")]
    # now c2 = 9, c3("a b c")=7, c3("a b d")=2
    ref = _df(spark, rows)
    model = {r.gram: r.surprise for r in fit_trigram_lm(ref).collect()}
    assert model["a b c"] == len(bin(9)[2:]) - len(bin(7)[2:]) + 1  # = 2
    assert model["a b d"] == len(bin(9)[2:]) - len(bin(2)[2:]) + 1  # = 3
    capped = {
        r.gram: r.surprise for r in fit_trigram_lm(ref, unseen=2).collect()
    }
    assert capped == {"a b c": 2, "a b d": 2}


def test_doc_surprise_hand_computed(spark):
    """Score laws on the hand-fit model {'a b c': 1}: seen gram costs 1,
    unseen costs LM_UNSEEN_BITS, short/NULL docs keep their row with
    n_grams=0 and NULL average."""
    ref = _df(spark, [(1, "a b c a b c"), (2, "a b c d")])
    model = fit_trigram_lm(ref)
    crawl = _df(
        spark, [(10, "a b c"), (11, "x y z w"), (12, "a b"), (13, None)]
    )
    out = {r.doc_id: r for r in doc_surprise(crawl, model).collect()}
    assert set(out) == {10, 11, 12, 13}
    assert (out[10].n_grams, out[10].sum_surprise, out[10].surprise_x16) == (
        1, 1, 16,
    )
    assert (out[11].n_grams, out[11].sum_surprise) == (2, 2 * LM_UNSEEN_BITS)
    assert out[11].surprise_x16 == 16 * LM_UNSEEN_BITS
    for short in (12, 13):
        assert (out[short].n_grams, out[short].sum_surprise) == (0, 0)
        assert out[short].surprise_x16 is None


def test_doc_surprise_bounds_corpus(spark, sf_dir):
    """On the real benchmark frames: one row per crawl doc, n_grams =
    max(n_tokens-2, 0), and every average sits in [1, UNSEEN] bits
    (in-model surprise >= 1 because c2 >= c3; the cap bounds above)."""
    from ocr_parallel_spark.queries_catalog import q_lm_surprise

    rows = q_lm_surprise(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    for r in rows:
        if r.n_grams == 0:
            assert r.sum_surprise == 0 and r.surprise_x16 is None
        else:
            assert 16 <= r.surprise_x16 <= 16 * LM_UNSEEN_BITS
            assert r.n_grams <= r.sum_surprise <= r.n_grams * LM_UNSEEN_BITS


def test_lm_separation_gate(spark, sf_dir):
    """The measured-behavior floor (VERDICT r4 #3 pattern): planted
    gibberish must average >= 1.25x clean surprise. Measured ~1.6x at
    sf0.001, ~1.5x at sf0.01, ~2.3x at sf0.1."""
    from ocr_parallel_spark.queries_catalog import q_lm_separation

    r = q_lm_separation(spark, sf_dir).collect()[0]
    assert r.sep_ok, r.asDict()
    assert r.n_clean > 0 and r.n_taint > 0
    assert r.mean_taint_x16 * 4 >= r.mean_clean_x16 * 5


def test_model_prune_keeps_repeats_only(spark, sf_dir):
    """On the reference split of the real corpus the pruned model is
    non-trivial (template text repeats trigrams) yet far smaller than
    the raw gram space — the property that makes it broadcastable."""
    from ocr_parallel_spark.queries_catalog import _lm_frames

    _, ref = _lm_frames(spark, sf_dir)
    n_model = fit_trigram_lm(ref).count()
    n_raw = trigram_positions(ref).select("gram").distinct().count()
    assert 0 < n_model < n_raw


def test_lm_terciles_laws(spark, sf_dir):
    """Head/middle/tail cut laws per language: buckets are score-ordered
    (max head score < min middle score < min tail score), every scored
    doc is bucketed exactly once, the head holds >= 1/3 of docs and
    head+middle >= 2/3 (cuts reach the tercile mass), and each cut is
    MINIMAL — dropping its boundary score-value would fall short."""
    from collections import defaultdict

    from ocr_parallel_spark.queries_catalog import q_lm_surprise, q_lm_terciles

    rows = q_lm_terciles(spark, sf_dir).collect()
    n_scored = q_lm_surprise(spark, sf_dir).filter("n_grams > 0").count()
    assert len(rows) == n_scored

    by_lang = defaultdict(lambda: defaultdict(list))
    for r in rows:
        by_lang[r.lang][r.ppl_bucket].append(r.surprise_x16)
    for lang, buckets in by_lang.items():
        n = sum(len(v) for v in buckets.values())
        h = buckets.get("head", [])
        m = buckets.get("middle", [])
        t = buckets.get("tail", [])
        assert len(h) > 0
        if m:
            assert max(h) < min(m)
        if t:
            assert max(m or h) < min(t)
        assert len(h) * 3 >= n
        assert (len(h) + len(m)) * 3 >= 2 * n
        # minimality: the head cut's own score-value is load-bearing
        boundary = sum(1 for s in h if s == max(h))
        assert (len(h) - boundary) * 3 < n
        if t:
            boundary2 = sum(1 for s in m or h if s == max(m or h))
            assert (len(h) + len(m) - boundary2) * 3 < 2 * n
