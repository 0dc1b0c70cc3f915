"""URL canonicalization for crawl dedup (training-data toolkit).

Before any content hashing, web-scale pipelines collapse URL aliases:
tracking parameters, case-variant hosts, fragments, and trailing slashes
multiply crawl rows for identical resources. The reference dedups on its
(bucket, file, page) request key (/root/reference/app/utils/
deduplication.py:11-21); at CC scale the analogous KEY canonicalization
is this module. Pure column expressions — regex + array ops, zero Python,
SQL-oracle-able.

Rules (documented order, deterministic):
1. strip the fragment (``#...``),
2. lowercase the scheme+host prefix (path stays case-sensitive),
3. drop tracking query params (utm_*, gclid, fbclid, ref) and SORT the
   survivors (param order never distinguishes resources),
4. strip trailing slashes from the path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# '=' optional: redirectors append valueless trackers ("?gclid").
# (=|\z) not (=|$): Java's '$' matches before a trailing newline while
# RE2's does not, so a noisy key like "?gclid\n" would be dropped by
# Spark but kept by the DuckDB oracle. \z is end-of-text in both.
TRACKING_PARAM_RE = r"^(utm_[^=&]*|gclid|fbclid|ref)(=|\z)"


def canonical_url(url: Column | str) -> Column:
    # \z anchors (end of TEXT) + (?s) dotall, not '$': Java's default '$'
    # matches before a final newline while RE2's does not — a trailing
    # line terminator in a noisy crawl key would silently diverge the two
    # engines. \z and (?s) mean the same thing in both.
    c = F.col(url) if isinstance(url, str) else url
    no_frag = F.regexp_replace(c, r"(?s)#.*\z", "")
    base = F.regexp_extract(no_frag, r"^([^?]*)", 1)
    query = F.regexp_extract(no_frag, r"(?s)\?(.*)\z", 1)
    prefix = F.regexp_extract(base, r"(?i)^(https?://[^/?#]+)", 1)
    rest = F.substring(base, F.length(prefix) + 1, F.lit(1 << 30))
    base_lc = F.concat(F.lower(prefix), rest)
    base_clean = F.regexp_replace(base_lc, r"/+\z", "")
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (F.length(p) > 0) & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    return F.when(
        F.size(kept) > 0,
        F.concat(base_clean, F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(base_clean)


def host_col(url: Column | str) -> Column:
    """Lowercased host from a crawl URL, for blocklist matching and
    per-domain keying: case-insensitive scheme (RFC 3986 — 'HTTPS://'
    is the same scheme), userinfo and port stripped, so
    'HTTPS://User@Site-3.Example.COM:443/x' keys as
    'site-3.example.com'. A naive case-sensitive, authority-verbatim
    extract lets blocklisted domains evade the screen via scheme case
    or an explicit port. ``\\z`` not '$' per the module's anchoring
    rule; all patterns are in the Java-regex/RE2 common subset so the
    DuckDB oracle applies the identical chain."""
    c = F.col(url) if isinstance(url, str) else url
    auth = F.regexp_extract(c, r"(?i)^https?://([^/?#]+)", 1)
    return F.lower(
        F.regexp_replace(F.regexp_replace(auth, r"^[^@]*@", ""), r":\d+\z", "")
    )
