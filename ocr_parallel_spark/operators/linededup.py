"""Inter-document line deduplication (CCNet-style boilerplate removal).

A line that appears in many documents is boilerplate (cookie banners,
nav menus, footers), not content; CCNet drops lines whose corpus-wide
frequency crosses a threshold. Generalizes the reference's exact
request-key dedup (D1/D2, app/services/batch_processor.py:116-140) from
document granularity to line granularity — keep-FIRST becomes
keep-if-rare.

Scale shape (the whole point at 100 TB): one explode, ONE shuffle to
build the line-frequency table keyed on the line hash, one shuffle join
back, one per-doc re-aggregation. The frequency table is the corpus's
distinct-line set — orders of magnitude smaller than the corpus — and
Spark's map-side partial aggregation means each executor ships one
(line_hash, partial_count) row per distinct local line, not one row per
occurrence. No driver collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_lines(
    lines: DataFrame,
    min_count: int = 5,
    id_col: str = "doc_id",
    line_no_col: str = "line_no",
    line_col: str = "line",
) -> DataFrame:
    """Drop every line occurring >= ``min_count`` times corpus-wide;
    reassemble each document from its surviving lines in order.

    Input: one row per (doc, line_no, line). Output: one row per doc —
    n_lines, n_kept (both bigint), kept_text (newline-joined survivors;
    '' when everything was boilerplate, so no document vanishes).

    The join key is sha2(line) rather than the line text: frequency
    counting and the join-back then shuffle 32-byte keys instead of
    arbitrarily long line bodies (the line text itself stays on the
    lines side and never crosses the count exchange).
    """
    key = F.sha2(F.col(line_col), 256).alias("_line_key")
    keyed = lines.select(id_col, line_no_col, line_col, key)
    freq = keyed.groupBy("_line_key").agg(F.count(F.lit(1)).alias("_line_docs"))
    kept = F.col("_line_docs") < min_count
    return (
        keyed.join(freq, "_line_key")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                kept, F.struct(F.col(line_no_col), F.col(line_col))
                            )
                        )
                    ),
                    lambda s: s[line_col],
                ),
                "\n",
            ).alias("kept_text"),
        )
    )
