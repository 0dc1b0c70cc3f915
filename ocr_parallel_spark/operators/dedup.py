"""Deduplication — the reference's signature optimization, Spark-first.

SURVEY §2.4. The reference dedups request rows by key before the expensive
per-page call (/root/reference/app/utils/deduplication.py:24-61) with
explicit keep-FIRST semantics (first occurrence wins, insertion order
preserved) and logs the savings (:54-59). Plain ``dropDuplicates`` is
nondeterministic about *which* row survives, so keep-first is expressed as
a ``row_number`` window over an explicit order column — deterministic at
any parallelism level.

At web scale the same savings come from content identity: sha-256 over the
normalized extracted text (exact, D4) and SimHash banding (near, see
``neardup.py``). Both run BEFORE downstream expensive stages, mirroring the
reference's dedup-before-work plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def keep_first(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    flag_col: str | None = None,
) -> DataFrame:
    """Keep-first dedup (D2): one survivor per key — the row that sorts
    first by ``order_cols`` (e.g. earliest warc_ts = first crawl wins).

    With ``flag_col`` set, rows are kept and marked instead of dropped
    (needed by the map-back join J1). One shuffle on ``key_cols``; at scale
    the shuffle is the unavoidable cost of global identity — pre-bucketed
    storage on the same key makes it a zero-exchange sort.
    """
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])
    ranked = df.withColumn("_rn", F.row_number().over(w))
    if flag_col is not None:
        return ranked.withColumn(flag_col, F.col("_rn") > 1).drop("_rn")
    return ranked.filter(F.col("_rn") == 1).drop("_rn")


def content_key(text_col: str = "text") -> F.Column:
    """D4 exact-content identity: sha-256 over the (already normalized)
    extracted text. JVM built-in — stays inside whole-stage codegen."""
    return F.sha2(F.col(text_col), 256)


def mark_exact_content_dups(
    df: DataFrame,
    text_col: str = "text",
    order_cols: list[str] = ("warc_ts", "url"),
) -> DataFrame:
    """Add ``content_sha256``, ``is_exact_dup`` (true for every row whose
    text was already seen on an earlier row) and ``rep_url`` (the keeper's
    url). Error rows (NULL text) are never dup-marked."""
    hashed = df.withColumn(
        "content_sha256",
        F.when(F.col(text_col).isNotNull(), content_key(text_col)),
    )
    w = Window.partitionBy("content_sha256").orderBy(
        *[F.col(c) for c in order_cols]
    )
    return (
        hashed.withColumn(
            "_rn",
            F.when(F.col("content_sha256").isNotNull(), F.row_number().over(w)),
        )
        .withColumn("is_exact_dup", F.coalesce(F.col("_rn") > 1, F.lit(False)))
        .withColumn(
            "rep_url",
            F.when(
                F.col("content_sha256").isNotNull(),
                F.first("url").over(w),
            ),
        )
        .drop("_rn")
    )


def dedup_savings(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """D3 duplicate accounting: total vs unique vs duplicates
    (deduplication.py:54-59; README.md:190-193 worked example)."""
    return df.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.count_distinct(*[F.col(c) for c in key_cols]).alias("unique_rows"),
        (
            F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in key_cols])
        ).alias("duplicate_rows"),
    )
