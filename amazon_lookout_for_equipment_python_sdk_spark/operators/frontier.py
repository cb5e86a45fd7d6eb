"""Crawl-frontier batch assignment — politeness scheduling as a data
transform.

A polite fetcher issues at most ``per_host_per_batch`` requests to one
host per round, so a discovered URL corpus must be SCHEDULED: rank each
host's URLs, then ``batch = floor(rank / k)``.  The fetch itself stays
external (the engine transforms bytes, it does not crawl) — this
operator emits the plan the fetch loop walks batch by batch.

Scale design — built cliff-free from the start: per-host ranking is
``row_number`` over the host partition, and a mega-host (a domain with
tens of millions of discovered URLs) would serialize that window onto
one task — the exact serialized-sort-cliff class the engine's ten
routed twin families close (operators/routing.py).  There is no
ordering requirement here beyond determinism, so the twin IS the
operator: the rank axis is ``xxhash64(url)`` (deterministic,
order-free), buckets are VALUE RANGES of that axis (row-local split,
no pre-pass), ranks compose as bucket-local ``row_number`` plus an
exclusive prefix count offset joined back via the tiny null-safe
boundary table (``_chunkjoin.join_boundary`` — the pack/restamp
decomposition).  One corpus exchange on (host, bucket) + one broadcast
of a |hosts| x |buckets| aggregate; no per-host serialization at any
corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._chunkjoin import join_boundary

#: value-range split of the signed-64 hash axis: bucket = axis >> shift,
#: 58 -> 64 buckets spanning the full int64 range in axis order.
_BUCKET_SHIFT = 58


def frontier_batches(
    df: DataFrame,
    url_col: str = "url",
    host_col: "str | None" = None,
    per_host_per_batch: int = 1,
    out_col: str = "fetch_batch",
    per_host_k: "DataFrame | None" = None,
) -> DataFrame:
    """Add ``fetch_batch`` (0-based): at most ``per_host_per_batch``
    of any host's rows share a batch, and batches are dense per host
    (0, 1, 2, ...).  ``host_col=None`` derives the host from the URL
    (NULL hosts — unparseable URLs — schedule as one pseudo-host;
    gate them earlier with ``url_filter`` if that is not wanted).

    ``per_host_k`` optionally OVERRIDES the global cap per host: a
    two-column DataFrame ``(host, k)`` — e.g. derived from
    ``robots_delays`` via ``k = floor(batch_period / crawl_delay_s)``
    — joined broadcast on the CASE-FOLDED host; hosts absent from the
    table (or carrying a NULL k) use ``per_host_per_batch``, k values
    below 1 clamp to 1 (a host can never be denied entirely here;
    that is ``robots_filter``'s job), and duplicate host rows
    collapse to the smallest k (conservative) rather than
    multiplying output rows — a NULL k merges as the global cap, so
    a host carrying both a concrete and a NULL row resolves to
    ``min(concrete, per_host_per_batch)``.  Real polite crawlers need per-host
    rates: one global cap either starves fast hosts or hammers slow
    ones (r13 verdict #5).

    Assignment is deterministic for a given row multiset: the per-host
    order is the ``xxhash64`` of the URL string (ties between byte-
    identical duplicate URLs are broken arbitrarily but their BATCH
    assignments still hold the per-batch cap).  Deliberately hash
    order, not discovery order: discovery order would need a real
    ordering column (pass one through ``sort first
    → row_number`` upstream if required), while hash order also
    SPREADS a host's path neighborhoods across batches — the
    politeness-friendly access pattern."""
    if out_col in df.columns:
        raise ValueError(
            f"input column {out_col!r} collides with frontier_batches "
            "output; rename it or pass a different out_col"
        )
    # the staging columns ride on the FULL frame (withColumn), so the
    # whole input must be clash-free — withColumn would silently
    # REPLACE a same-named passenger column and .drop would eat it.
    # Guard exactly the names frontier stages (plus join_boundary's
    # _nsj_ prefix), NOT the full chunked-twin reserved set: a
    # passenger column named _m or _c is harmless here and rejecting
    # it is the spurious-rejection class r13 ADVICE flagged.
    staged = ("_fb_h", "_fb_a", "_fb_r", "_fb_k", "_b", "_off")
    clash = sorted(
        c
        for c in df.columns
        if c in staged or c.startswith("_nsj_")
    )
    if clash:
        raise ValueError(
            f"input columns {clash} collide with frontier_batches "
            "staging; rename them first"
        )
    if per_host_per_batch < 1:
        raise ValueError("per_host_per_batch must be >= 1")
    host = (
        F.col(host_col)
        if host_col
        else F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    )
    rows = df.withColumn("_fb_h", host).withColumn(
        "_fb_a", F.xxhash64(F.col(url_col).cast("string"))
    )
    rows = rows.withColumn(
        "_b", F.shiftright(F.col("_fb_a"), _BUCKET_SHIFT)
    )
    wl = Window.partitionBy("_fb_h", "_b").orderBy("_fb_a")
    local = rows.withColumn("_fb_r", F.row_number().over(wl))
    wb = (
        Window.partitionBy("_fb_h")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        rows.groupBy("_fb_h", "_b")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .withColumn("_off", F.coalesce(F.sum("_bn").over(wb), F.lit(0)))
        .drop("_bn")
    )
    joined = join_boundary(local, offsets, ["_fb_h"], ["_b"])
    rank = F.col("_off") + F.col("_fb_r") - F.lit(1)
    k = F.lit(int(per_host_per_batch))
    if per_host_k is not None:
        hc, kc = per_host_k.columns[:2]
        # duplicate hosts in the rate table (http+https robots
        # snapshots, re-fetches) would MULTIPLY frontier rows through
        # the left join — collapse to one row per host, conservative
        # (smallest k) wins.  A NULL k merges as the GLOBAL cap (the
        # value it would fall back to anyway), so a host carrying BOTH
        # a concrete row and a NULL row resolves to
        # min(concrete, global) — the conservative claim holds even
        # when the global cap is the smaller (r15 ADVICE; a bare
        # F.min skipped the NULLs and let the concrete k win).  Hosts
        # with only concrete rows or only NULL rows are unchanged.
        rates = (
            per_host_k.select(
                F.lower(F.col(hc).cast("string")).alias("_nsj__fb_h"),
                F.coalesce(
                    F.col(kc).cast("long"), F.lit(int(per_host_per_batch))
                ).alias("_fb_k"),
            )
            .groupBy("_nsj__fb_h")
            .agg(F.min("_fb_k").alias("_fb_k"))
            .withColumn("_fb_k", F.greatest(F.col("_fb_k"), F.lit(1)))
        )
        # broadcast |hosts| rows; null-safe so a NULL pseudo-host can
        # carry a rate too; absent hosts fall back to the global cap.
        # The join compares case-folded hosts (rates are lowercased
        # above) so an explicit mixed-case host_col still matches its
        # rate without changing the GROUPING key itself.
        joined = joined.join(
            F.broadcast(rates),
            F.lower(F.col("_fb_h")).eqNullSafe(F.col("_nsj__fb_h")),
            "left",
        ).drop("_nsj__fb_h")
        k = F.coalesce(F.col("_fb_k"), k)
    return joined.withColumn(
        out_col, F.floor(rank / k).cast("long")
    ).drop("_fb_h", "_fb_a", "_fb_r", "_fb_k", "_b", "_off")
