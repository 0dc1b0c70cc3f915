"""End-to-end pipeline tests over the synthesized pages table.

SURVEY §5 items 3-5: golden equality (byte-identical extracted text per
url), error-as-data, dedup marking, and determinism across parallelism.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ocr_parallel_spark.pages import synthesize_pages
from ocr_parallel_spark.pipeline import pipeline_stats, run_extraction_pipeline


def _result(spark, sf_dir):
    pages = synthesize_pages(spark, sf_dir, with_expected=True)
    expected = pages.select("url", "warc_ts", "doc_id", "expected_text")
    result = run_extraction_pipeline(pages.drop("expected_text", "doc_id"))
    return pages, expected, result


def test_byte_identical_per_url(spark, sf_dir):
    """THE invariant: extracted text == expected text for every kept url."""
    pages, expected, result = _result(spark, sf_dir)
    # keep-first by url: compare against the expected text of the earliest
    # crawl per url.
    first_expected = (
        expected.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("url").orderBy("warc_ts")),
        )
        .filter(F.col("rn") == 1)
        .select("url", "expected_text")
    )
    joined = result.join(first_expected, "url", "inner")
    mismatches = joined.filter(
        (F.col("status") == "found")
        & (
            F.col("text").isNull()
            | (F.col("text") != F.col("expected_text"))
        )
    )
    bad = mismatches.select("url", "text", "expected_text").limit(5).collect()
    assert not bad, f"text mismatch for {bad}"
    # error rows have NULL text and an error_type
    errs = joined.filter(F.col("status") == "error")
    assert errs.filter(F.col("text").isNotNull()).count() == 0
    assert errs.filter(F.col("error_type").isNull()).count() == 0


def test_keep_first_dedup_unique_urls(spark, sf_dir):
    pages, _, result = _result(spark, sf_dir)
    n_unique_urls = pages.select("url").distinct().count()
    assert result.count() == n_unique_urls
    assert result.select("url").distinct().count() == n_unique_urls
    # synthesis guarantees ~10% url dups at sf0.001 (doc_id % 10 == 9)
    assert pages.count() > n_unique_urls


def test_exact_content_dups_marked(spark, sf_dir):
    _, _, result = _result(spark, sf_dir)
    dups = result.filter(F.col("is_exact_dup"))
    assert dups.count() > 0
    # every dup's representative has identical text
    rep = result.select(
        F.col("url").alias("rep_url"), F.col("text").alias("rep_text")
    )
    joined = dups.join(rep, "rep_url", "inner")
    assert joined.filter(F.col("text") != F.col("rep_text")).count() == 0
    # representatives are never themselves marked dup
    assert (
        result.filter((F.col("url") == F.col("rep_url")) & F.col("is_exact_dup"))
        .count()
        == 0
    )


def test_near_dups_marked(spark, sf_dir):
    _, _, result = _result(spark, sf_dir)
    # synthesis plants near-dups (doc_id % 25 == 21): small drift off the
    # previous doc's text
    assert result.filter(F.col("is_near_dup")).count() > 0


def test_error_rows_never_fail_job(spark, sf_dir):
    _, _, result = _result(spark, sf_dir)
    errors = result.filter(F.col("status") == "error")
    n = errors.count()
    assert n > 0  # synthesis plants malformed payloads
    types = {r["error_type"] for r in errors.select("error_type").distinct().collect()}
    assert types <= {"EMPTY", "DECODE", "PARSE", "PDF", "UNKNOWN"}


def test_stats_rollup(spark, sf_dir):
    _, _, result = _result(spark, sf_dir)
    stats = pipeline_stats(result).collect()[0]
    assert stats["total_rows"] == stats["success_count"] + stats["error_count"] + stats["not_found_count"]
    assert stats["success_count"] > 0
    assert stats["total_bytes_in"] > 0


def test_determinism_across_parallelism(spark, sf_dir):
    """Same input, different partitioning => byte-identical result set."""
    pages = synthesize_pages(spark, sf_dir).drop("doc_id")
    r1 = run_extraction_pipeline(pages.repartition(2), near_dups=False)
    r2 = run_extraction_pipeline(pages.repartition(17), near_dups=False)
    cols = ["url", "status", "text", "content_sha256", "is_exact_dup"]
    a = sorted(map(tuple, r1.select(*cols).collect()))
    b = sorted(map(tuple, r2.select(*cols).collect()))
    assert a == b


def test_x8_chooser_flips_on_dup_rate_and_results_identical(spark, sf_dir):
    """X8 stats-driven path choice: a high-dup input flips the chooser to
    dedup-first (the reference's cheap-statistic model switch,
    config.py:36-43 analog); pipeline results are identical either way."""
    from ocr_parallel_spark.pipeline import choose_dedup_before_extract

    pages = synthesize_pages(spark, sf_dir).drop("doc_id")
    # synthesized pages: ~10% url dups -> extract-first wins
    assert choose_dedup_before_extract(pages, threshold=0.3) is False

    # replicate every row 3x -> dup rate ~2/3 -> dedup-first wins
    reps = spark.range(3).select(F.col("id").alias("_r"))
    high_dup = pages.crossJoin(reps).drop("_r")
    assert choose_dedup_before_extract(high_dup, threshold=0.3) is True

    # results identical under either plan (deterministic kernel +
    # keep-first): compare full output sets on a small slice
    small = pages.limit(120)
    cols = ["url", "status", "text", "content_sha256", "is_exact_dup"]
    a = run_extraction_pipeline(small, near_dups=False,
                                dedup_before_extract=True)
    b = run_extraction_pipeline(small, near_dups=False,
                                dedup_before_extract="auto")
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


def test_hostile_charset_roundtrip(spark, tmp_path):
    """Escaping guard: text containing PDF-literal and JSON metachars
    (backslash, parens, quotes) must survive synthesis -> kernel ->
    normalize byte-identically. doc_ids are chosen to hit the %FAKEPDF
    (11 mod 40), real-%PDF (31 mod 40), and HTML flavors."""
    import pandas as pd

    hostile = 'weird (parens) and \\backslash\\ and "quotes" and \\n literal'
    rows = [
        (11, "srcH", hostile + " fakepdf flavor", "en", 40),
        (31, "srcH", hostile + " realpdf flavor", "en", 40),
        (12, "srcH", hostile + " html flavor", "en", 40),
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "source", "text", "lang", "n_chars"]
    )
    d = str(tmp_path / "hostile")
    spark.createDataFrame(pdf).write.parquet(f"{d}/documents.parquet")

    pages = synthesize_pages(spark, d, with_expected=True)
    result = run_extraction_pipeline(
        pages.drop("expected_text", "doc_id"), near_dups=False
    )
    expected = {r.url: r.expected_text for r in pages.collect()}
    got = {r.url: (r.status, r.text) for r in result.collect()}
    assert len(got) == 3
    for url, (status, text) in got.items():
        assert status == "found", (url, status)
        assert text == expected[url], url
        assert "(parens)" in text and '"quotes"' in text and "\\backslash\\" in text


def test_simhash_closure_collapses_chains(spark):
    """closure_rounds: a drift chain A~B~C (each link Hamming 2, ends
    Hamming 4 — NOT a verified pair) collapses to one representative
    under bounded label propagation; the one-iteration default labels C
    with B (the documented approximation)."""
    from ocr_parallel_spark.operators.neardup import mark_simhash_near_dups

    base = 0x0123456789ABCDEF
    a = base
    b = base ^ 0b11              # bits 0,1 -> band 0 differs only
    c = b ^ (0b11 << 16)         # bits 16,17 -> band 1 differs vs b
    d = 0x7654321087654321       # unrelated
    df = spark.createDataFrame(
        [("a", a), ("b", b), ("c", c), ("d", d)], "url string, simhash long"
    )
    one_iter = {
        r.url: (r.near_rep, r.is_near_dup)
        for r in mark_simhash_near_dups(df).collect()
    }
    assert one_iter["a"] == ("a", False)
    assert one_iter["b"] == ("a", True)
    assert one_iter["c"] == ("b", True)  # the documented 1-hop label
    assert one_iter["d"] == (None, False)

    closed = {
        r.url: (r.near_rep, r.is_near_dup)
        for r in mark_simhash_near_dups(df, closure_rounds=2).collect()
    }
    assert closed["a"] == ("a", False)
    assert closed["b"] == ("a", True)
    assert closed["c"] == ("a", True)  # chain collapsed to one rep
    assert closed["d"] == (None, False)

    # longer chain a~b~c~e~f: 2 rounds reach 3 hops (r+1)
    e = c ^ (0b11 << 32)
    f = e ^ (0b11 << 48)
    df2 = spark.createDataFrame(
        [("a", a), ("b", b), ("c", c), ("e", e), ("f", f)],
        "url string, simhash long",
    )
    closed2 = {
        r.url: r.near_rep
        for r in mark_simhash_near_dups(df2, closure_rounds=3).collect()
    }
    assert set(closed2.values()) == {"a"}, closed2
