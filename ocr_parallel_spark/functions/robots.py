"""robots.txt parsing + retroactive URL filtering (RFC 9309 subset).

Crawl pipelines apply robots rules retroactively — CC publishes the
pages, the curator decides what a polite corpus may keep — so the
operator is a JOIN, not a fetcher: a (host, robots_txt) table parsed
into per-host prefix rules, matched against a url table with the RFC's
longest-match-wins / Allow-beats-Disallow-on-tie semantics.

The subset implemented is what corpus builders actually use: the
``User-agent: *`` group's ``Allow``/``Disallow`` prefix rules, comments
stripped, empty ``Disallow:`` (allow-all) respected, unknown
directives ignored. No wildcards/``$`` (non-standard extensions) —
documented out of scope.

Everything is column expressions and windows: robots parsing is a line
explode + a per-host running block id (a ``User-agent`` line opens a
new group unless it extends a run of agent lines), so a million-host
robots table parses as one shuffle-per-host pass, and rule matching is
one host equi-join + a per-url max over (prefix length, is-allow)
structs — AQE picks broadcast vs shuffle by the rules table's real
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots(robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) -> (host, rule_type, prefix) for the
    ``User-agent: *`` group(s). Empty-path rules (``Disallow:`` =
    allow everything) are dropped here — absence of a matching rule
    already means allowed."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), r"\r?\n")).alias("line_no", "raw"),
    )
    trimmed = F.trim(F.regexp_replace(F.col("raw"), r"#.*$", ""))
    lines = lines.select(
        "host",
        "line_no",
        F.regexp_extract(trimmed, r"(?i)^user-agent:\s*(\S+)", 1).alias("ua"),
        F.lower(
            F.regexp_extract(trimmed, r"(?i)^(allow|disallow)\s*:", 1)
        ).alias("rule_type"),
        F.regexp_extract(
            trimmed, r"(?i)^(?:allow|disallow)\s*:\s*(\S+)", 1
        ).alias("prefix"),
    )
    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = F.col("ua") != ""
    # a UA line opens a new block unless the previous line was also UA
    # (consecutive agent lines share one group per the RFC)
    new_block = is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False))
    blocks = lines.withColumn(
        "block_id",
        F.sum(new_block.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    star_blocks = (
        blocks.filter(is_ua & (F.col("ua") == "*"))
        .select("host", "block_id")
        .distinct()
    )
    return (
        blocks.filter((F.col("rule_type") != "") & (F.col("prefix") != ""))
        .join(star_blocks, ["host", "block_id"])
        .select("host", "rule_type", "prefix")
    )


def apply_robots(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Mark each url row ``disallowed`` per the parsed rules.

    Longest matching prefix wins; on equal length Allow beats Disallow
    (RFC 9309 §2.2.2); no matching rule (or no rules for the host)
    means allowed. Adds one boolean column, preserves the input rows.
    """
    key = [host_col, path_col]
    cand = urls.select(*key).distinct().join(rules, on=host_col, how="inner")
    matched = cand.filter(F.col(path_col).startswith(F.col("prefix")))
    # struct max orders lexicographically: longest prefix first, then
    # Allow over Disallow on ties; rule_type rides along for the verdict
    best = matched.groupBy(*key).agg(
        F.max(
            F.struct(
                F.length("prefix").alias("l"),
                (F.col("rule_type") == "allow").cast("int").alias("a"),
                F.col("rule_type"),
            )
        ).alias("_best_rule"),
    )
    verdict = best.select(
        *key, (F.col("_best_rule.rule_type") == "disallow").alias("_dis")
    )
    return urls.join(verdict, on=key, how="left").withColumn(
        "disallowed", F.coalesce(F.col("_dis"), F.lit(False))
    ).drop("_dis")
