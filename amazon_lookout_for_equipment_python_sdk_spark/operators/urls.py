"""URL-level corpus gates — the first filter in a crawl pipeline.

Every production crawl-to-corpus chain (RefinedWeb/FineWeb/Dolma style)
gates on the URL before touching payload bytes: scheme allowlists,
domain blocklists (UT1-style lists hold millions of domains), and
path-shape heuristics.  This module completes the engine's crawl chain
(sources/warc.py → here → html → quality → dedup) with Spark-built-in
parsing (``parse_url`` — JVM-side, whole-stage codegen) and a
JOIN-based blocklist probe that scales to multi-million-entry lists.

Scale design:

- **Features are row-local** (one projection, no shuffle).
- **Domain blocking is a suffix SEMI-JOIN, not a predicate chain**: a
  host matches a blocked domain when ANY dot-suffix of the host equals
  a list entry (``ads.tracker.example.com`` is blocked by
  ``example.com``).  Building the OR-of-endswith predicate inlines the
  whole list into the plan — fine for tens of entries, catastrophic
  for a UT1-sized list.  Instead the host explodes into its ≤ ~10
  dot-suffixes and LEFT ANTI joins the blocklist on equality; Spark
  broadcasts a small list and shuffle-joins a huge one, both exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: columns :func:`url_features` appends; inputs may not already carry
#: them (the select('*', ...) would silently duplicate the name and
#: every downstream F.col reference would die ambiguous mid-plan).
FEATURE_COLS = ("scheme", "host", "tld", "path_depth", "has_query")

#: staging names :func:`url_filter`'s blocklist probe introduces —
#: withColumn would silently REPLACE a same-named input column.
_FILTER_INTERNAL = ("_sfx", "_blk_domain", "_blk_host")


def _guard_clashes(df: DataFrame, reserved: "tuple[str, ...]") -> None:
    clash = sorted(set(df.columns) & set(reserved))
    if clash:
        raise ValueError(
            f"input columns {clash} collide with url operator outputs; "
            "rename them first (same loud-guard contract as "
            "_chunkjoin.guard_internal)"
        )


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Row-local URL anatomy: ``scheme``, ``host``, ``registered-ish``
    TLD, path depth, and query presence — the columns downstream
    filters and per-domain rollups group on.  NULL/unparseable URLs
    yield NULL features (``parse_url`` semantics).  Raises on input
    frames already carrying a feature column (r12 ADVICE)."""
    _guard_clashes(df, FEATURE_COLS)
    url = F.col(url_col)
    # try_parse_url: ANSI mode (Spark 4 default) makes parse_url THROW
    # on a malformed URL — one bad row must not sink a crawl batch
    host = F.try_parse_url(url, F.lit("HOST"))
    path = F.try_parse_url(url, F.lit("PATH"))
    # split("://", 1)[0] rather than a regex: parse_url has no SCHEME part
    scheme = F.when(
        url.contains("://"), F.split(url, "://", 2).getItem(0)
    )
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    return df.select(
        "*",
        F.lower(scheme).alias("scheme"),
        F.lower(host).alias("host"),
        F.element_at(F.split(F.lower(host), r"\."), -1).alias("tld"),
        F.size(segs).alias("path_depth"),
        F.try_parse_url(url, F.lit("QUERY")).isNotNull().alias("has_query"),
    )


def _host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host, most-specific first:
    ``a.b.c`` -> ``[a.b.c, b.c, c]`` — JVM-side transform, no UDF."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: F.array_join(F.slice(parts, i, n - i + 1), "."),
    )


def url_filter(
    df: DataFrame,
    url_col: str = "url",
    blocked_domains: "DataFrame | None" = None,
    allowed_schemes: "tuple[str, ...]" = ("http", "https"),
    max_path_depth: "int | None" = None,
    keep_null_urls: bool = False,
) -> DataFrame:
    """Keep rows whose URL passes the crawl gates; returns the input
    columns plus the :func:`url_features` columns.

    ``blocked_domains`` is a one-column DataFrame (``domain``,
    lowercase, no scheme) — a row is dropped when ANY dot-suffix of
    its host equals an entry, so listing ``example.com`` also blocks
    every subdomain.  Passed as a DataFrame (not a Python list) so a
    UT1-scale list stays distributed; wrap small lists with
    ``spark.createDataFrame``.  NULL/unparseable URLs drop unless
    ``keep_null_urls``."""
    if blocked_domains is not None:
        _guard_clashes(df, _FILTER_INTERNAL)
    feats = url_features(df, url_col)
    cond = F.col("scheme").isin(*[s.lower() for s in allowed_schemes])
    if max_path_depth is not None:
        cond = cond & (
            F.col("path_depth").isNull()
            | (F.col("path_depth") <= max_path_depth)
        )
    if keep_null_urls:
        cond = cond | F.col(url_col).isNull()
    else:
        cond = cond & F.col("host").isNotNull()
    out = feats.filter(cond)
    if blocked_domains is None:
        return out
    dom_col = blocked_domains.columns[0]
    block = blocked_domains.select(
        F.lower(F.col(dom_col)).alias("_blk_domain")
    )
    exploded = out.withColumn(
        "_sfx", F.explode_outer(_host_suffixes(F.col("host")))
    )
    hit = exploded.join(
        block,
        exploded["_sfx"] == block["_blk_domain"],
        "left_semi",
    ).select(F.col("host").alias("_blk_host")).distinct()
    return out.join(
        hit, out["host"] == hit["_blk_host"], "left_anti"
    )
