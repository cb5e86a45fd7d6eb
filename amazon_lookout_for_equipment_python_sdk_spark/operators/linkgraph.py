"""Hyperlink extraction and link-graph analysis — the crawl-side
quality prior every web-scale corpus pipeline ends up needing.

The chain: :func:`html_extract_links` harvests ``<a href>`` anchors
from raw HTML (row-local Arrow kernel, the ``html.py`` parser family),
:func:`host_graph` folds them into a weighted host-level edge list
(one shuffle), and :func:`pagerank` runs damped power iteration over
that graph as pure DataFrame algebra — the classic join-based Pregel
formulation (contributions = edges ⋈ ranks on src, grouped by dst),
no RDDs, no GraphFrames dependency.

Beyond-reference scope: the reference engine has no link layer at all;
this exists because host-level PageRank / in-degree are the standard
crawl-frontier prioritizers and corpus quality priors (OPIC,
Common Crawl host ranks, the Dolma/C4 source-weighting step).

Scale design:

- **Link extraction is row-local** (``mapInPandas``, zero shuffle).
- **The host graph is one map-side-combinable count aggregate**; its
  size is |hosts|² worst case but Zipf-sparse in practice (~edges ≈
  tens per host), orders of magnitude below the page corpus.
- **PageRank shuffles the EDGE list once per iteration** on the join
  key (src), plus a broadcast-sized rank frame when |nodes| is small;
  the deduplicated edge list and out-weights persist across
  iterations, each iteration's rank frame local-checkpoints (plan
  truncation — persist alone lets the analyzed tree grow ~3^k), and
  every scalar the update rule needs (N, dangling mass) rides a
  broadcast 1-row cross-join — the engine's zorder/bloom/lm pattern —
  so there is no per-iteration driver collect.
- **Grid mode is bit-deterministic**: with ``grid_scale`` set, ranks
  are scaled int64 and every update is integer multiply + integer
  division (``div``), so two engines (or two runs with different
  partitioning) produce IDENTICAL bits — the bigram-LM grid-floor
  pattern, which is what lets a registered query hash-match a DuckDB
  oracle exactly.  Bound: ``85 * rank * weight`` must fit int64 —
  rank ≤ grid_scale, so weights up to ~1e8 are safe at the default
  1e9 scale.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser
from urllib.parse import urljoin

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .html import _DROP_TAGS

LINK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("href", T.StringType(), False),
        T.StructField("anchor", T.StringType(), True),
        T.StructField("nofollow", T.BooleanType(), False),
    ]
)


class _LinkParser(HTMLParser):
    """Collect (href, anchor text, rel-nofollow) per ``<a>`` element.

    A second ``<a>`` start tag while one is open IMPLICITLY CLOSES the
    open anchor (the HTML5 tree-builder rule — browsers never nest
    anchors, so unclosed SIBLING anchors each keep their own href); an
    unclosed trailing ``<a>`` flushes at close.  Dropped subtrees
    (script/style/iframe... — ``_DROP_TAGS`` shared with the sibling
    text extractor so the two parsers can't diverge on drop policy)
    contribute neither anchor text NOR links (an ``<a>`` inside
    noscript/template fallback is not a rendered link)."""

    _DROP = _DROP_TAGS

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str, bool]] = []
        self._open = False
        self._drop_depth = 0
        self._href: "str | None" = None
        self._nofollow = False
        self._buf: list[str] = []

    def _flush(self) -> None:
        if self._href is not None:
            text = " ".join("".join(self._buf).split())
            self.links.append((self._href, text, self._nofollow))
        self._open, self._href = False, None
        self._nofollow, self._buf = False, []

    def handle_starttag(self, tag, attrs):
        if tag in self._DROP:
            self._drop_depth += 1
            return
        if tag != "a" or self._drop_depth:
            return
        if self._open:
            self._flush()  # HTML5: <a> implicitly closes an open <a>
        self._open = True
        d = dict(attrs)
        href = d.get("href")
        self._href = href.strip() if href else None
        rel = (d.get("rel") or "").lower().split()
        self._nofollow = "nofollow" in rel

    def handle_endtag(self, tag):
        if tag in self._DROP:
            self._drop_depth = max(0, self._drop_depth - 1)
        elif tag == "a" and self._open and not self._drop_depth:
            self._flush()

    def handle_data(self, data):
        if self._open and not self._drop_depth:
            self._buf.append(data)

    def close(self):
        super().close()
        if self._open:
            self._flush()


def extract_links(
    html: str, base_url: "str | None" = None
) -> "list[tuple[str, str, bool]]":
    """All anchors of one document as ``(href, anchor_text,
    nofollow)``; relative hrefs resolve against ``base_url`` when
    given (RFC 3986 reference resolution via ``urljoin``), pass
    through verbatim otherwise.  Empty and pure-fragment hrefs are
    dropped (self-references, not edges); broken HTML degrades to
    whatever parsed — one bad doc must not kill a task."""
    p = _LinkParser()
    try:
        p.feed(html or "")
        p.close()
    except Exception:  # noqa: BLE001
        pass
    out = []
    for href, text, nofollow in p.links:
        if not href or href.startswith("#"):
            continue
        if base_url:
            try:
                href = urljoin(base_url, href)
            except ValueError:
                pass
        out.append((href, text, nofollow))
    return out


def html_extract_links(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    base_col: "str | None" = None,
) -> DataFrame:
    """Corpus-scale link harvest: one output row per anchor —
    ``(doc_id, href, anchor, nofollow)``.  ``base_col`` names a
    per-row base URL for relative-reference resolution (typically the
    capture's ``target_uri``).  Row-local in Arrow batches, zero
    shuffle; documents without links emit nothing."""
    cols = [F.col(id_col).cast("long").alias("_lk_id"), F.col(html_col).alias("_lk_html")]
    if base_col is not None:
        cols.append(F.col(base_col).alias("_lk_base"))
    src = df.select(*cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bases = (
                pdf["_lk_base"]
                if "_lk_base" in pdf.columns
                else [None] * len(pdf)
            )
            ids, hrefs, anchors, nofollows = [], [], [], []
            for did, html, base in zip(pdf["_lk_id"], pdf["_lk_html"], bases):
                # a NULL id renders as NaN in the pandas int64->float64
                # column and would fail the LongType conversion for the
                # WHOLE Arrow task — skip the row instead (the module's
                # one-bad-row-must-not-sink-a-task stance, which
                # extract_links itself already follows; r15 ADVICE)
                if pd.isna(did):
                    continue
                for href, text, nofollow in extract_links(
                    html if html is not None else "", base
                ):
                    ids.append(did)
                    hrefs.append(href)
                    anchors.append(text)
                    nofollows.append(nofollow)
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": ids,
                        "href": hrefs,
                        "anchor": anchors,
                        "nofollow": nofollows,
                    }
                )

    return src.mapInPandas(run, schema=LINK_SCHEMA)


def _followed_dst(
    links: DataFrame,
    dst_url_col: str,
    nofollow_col: "str | None",
    extra: "list" = (),
) -> DataFrame:
    """Shared target-side policy for :func:`host_graph` and
    :func:`anchor_terms`: parse + case-fold the dst host (JVM-side;
    unparseable/relative hrefs drop) and apply the nofollow switch —
    NULL means "rel not recorded", i.e. NOT nofollow (a bare ``~col``
    filter would silently drop every null-rel link under three-valued
    logic).  ``extra`` columns ride through."""
    dst = F.lower(F.try_parse_url(F.col(dst_url_col), F.lit("HOST")))
    rows = links.select(
        dst.alias("dst_host"),
        *extra,
        *([F.col(nofollow_col).alias("_nf")] if nofollow_col else []),
    ).filter(F.col("dst_host").isNotNull())
    if nofollow_col:
        rows = rows.filter(~F.coalesce(F.col("_nf"), F.lit(False)))
    return rows


def host_graph(
    links: DataFrame,
    src_host_col: str = "src_host",
    dst_url_col: str = "href",
    nofollow_col: "str | None" = "nofollow",
    drop_self: bool = True,
) -> DataFrame:
    """Weighted host-level edge list ``(src_host, dst_host, n_links)``
    from a link table: the dst host parses out of the link URL
    (``try_parse_url`` — JVM-side; unparseable/relative hrefs drop),
    hosts case-fold, ``rel=nofollow`` links drop (they exist to be
    excluded from ranking — pass ``nofollow_col=None`` to keep them;
    NULL rel = followed), and self-loops drop by default (a host's
    internal navigation otherwise dominates every weight).  One
    map-side-combinable aggregate — the graph is orders of magnitude
    smaller than the link table."""
    rows = _followed_dst(
        links,
        dst_url_col,
        nofollow_col,
        extra=[F.lower(F.col(src_host_col)).alias("src_host")],
    ).filter(F.col("src_host").isNotNull())
    if drop_self:
        rows = rows.filter(F.col("src_host") != F.col("dst_host"))
    return rows.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links")
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: "str | None" = "n_links",
    iterations: int = 10,
    damping: float = 0.85,
    grid_scale: "int | None" = None,
) -> DataFrame:
    """Damped PageRank over a weighted edge list, returned as
    ``(node, rank)`` — or ``(node, rank_scaled)`` int64 in grid mode.

    Semantics: standard power iteration.  ``rank₀ = 1/N``; each step
    ``rank' = (1-d)/N + d·(Σ inbound rank·w/out_w + dangling/N)`` —
    dangling nodes (no out-edges) spread their mass uniformly, so
    total mass is conserved (up to grid flooring in grid mode).
    Duplicate (src, dst) edge rows act as summed weight EXACTLY —
    the edge list pre-aggregates before iterating, so grid-mode bits
    do not depend on the caller's pre-aggregation (per-row flooring
    would break that).  The returned frame reads from its own local
    checkpoint; every internal cache is released before return.

    ``grid_scale`` switches every update to scaled-int64 arithmetic
    (``(85·r·w) div (100·out_w)`` with integer ``div``) — ranks become
    BIT-DETERMINISTIC across engines, run shapes, and partitionings,
    at a precision of 1/grid_scale of total mass.  The float path is
    for production ranking (last-ulp indeterminism is irrelevant
    there); the grid path is for replayable pipelines and oracle
    verification.  ``damping`` must be a multiple of 0.01 in grid
    mode (it becomes the integer percent pair).

    Scale: one shuffle per iteration (contributions group by dst) plus
    the edges ⋈ ranks equi-join on src — Spark broadcasts the rank
    side automatically while |nodes| is broadcast-sized, and AQE picks
    shuffle join beyond that.  The deduplicated edge list and
    out-weights compute once and persist; each iteration's rank frame
    is LOCAL-CHECKPOINTED (eager), which truncates the logical plan
    to a leaf — persist alone leaves the analyzed tree growing ~3^k
    with iterations until analysis dominates and plan rendering OOMs
    (measured at k=7).  N and the per-iteration dangling mass ride
    broadcast 1-row cross-joins (no driver collect in the loop).
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    if not 0.0 <= damping <= 1.0:
        raise ValueError("damping must be in [0, 1]")
    dpct = int(round(damping * 100))
    if grid_scale is not None and abs(dpct - damping * 100) > 1e-9:
        raise ValueError("grid mode needs damping in 0.01 steps")

    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    # pre-aggregate duplicate (src, dst) rows into ONE summed-weight
    # edge: in grid mode each row's contribution floors INDEPENDENTLY,
    # so floor(r·w1/ow) + floor(r·w2/ow) != floor(r·(w1+w2)/ow) — the
    # summed-weight contract (and the bit-determinism guarantee, which
    # must not depend on the caller's pre-aggregation) requires the
    # collapse.  Also persisted: every iteration re-reads this frame,
    # and an unpersisted corpus-derived edge lineage (e.g. straight
    # out of html_extract_links -> host_graph) would otherwise
    # re-execute the whole extraction per iteration.
    e = (
        edges.select(
            F.col(src_col).alias("_pr_s"),
            F.col(dst_col).alias("_pr_d"),
            w.alias("_pr_w"),
        )
        .groupBy("_pr_s", "_pr_d")
        .agg(F.sum("_pr_w").alias("_pr_w"))
        .persist()
    )
    nodes = (
        e.select(F.col("_pr_s").alias("node"))
        .union(e.select("_pr_d"))
        .distinct()
        .persist()
    )
    # N rides a broadcast 1-row frame (the zorder/bloom/lm pattern) —
    # the update rule needs it in-row, a collect would serialize the
    # driver into every iteration
    n_tbl = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("_pr_n")))
    outw = (
        e.groupBy("_pr_s").agg(F.sum("_pr_w").alias("_pr_ow")).persist()
    )

    grid = grid_scale is not None
    if grid:
        scale = int(grid_scale)
        init = F.expr(f"{scale} div _pr_n")
        # (100-dpct)*scale pre-multiplied in Python: as SQL it would be
        # INT32 * INT32 and ANSI-overflow during constant folding
        base = F.expr(f"{(100 - dpct) * scale} div (100 * _pr_n)")
        contrib = F.expr(f"({dpct} * _pr_r * _pr_w) div (100 * _pr_ow)")
        dshare = F.expr(f"({dpct} * _pr_dang) div (100 * _pr_n)")
        rtype = "long"
    else:
        init = F.lit(1.0) / F.col("_pr_n")
        base = F.lit(1.0 - damping) / F.col("_pr_n")
        contrib = (
            F.lit(damping) * F.col("_pr_r") * F.col("_pr_w") / F.col("_pr_ow")
        )
        dshare = F.lit(damping) * F.col("_pr_dang") / F.col("_pr_n")
        rtype = "double"

    # localCheckpoint (NOT persist) between iterations: persist caches
    # DATA but leaves the LOGICAL plan intact, and each step's plan
    # references the previous ranks ~3x (dangling agg + contribution
    # join + update), so the analyzed tree grows 3^k — by ~7
    # iterations, analysis alone dominates runtime and AQE's
    # plan-string rendering OOMs the heap.  The checkpoint truncates
    # lineage to a LogicalRDD leaf: constant plan depth, one
    # materializing job per iteration (eager).  Trade-off, documented:
    # checkpoint blocks are executor-local and non-replicated — on a
    # cluster, losing an executor mid-run means restarting the
    # iteration loop (acceptable: PageRank runs are idempotent and
    # minutes-scale; swap in sc.setCheckpointDir + Dataset.checkpoint
    # for reliable lineage on very long runs).  Superseded frames drop
    # to the ContextCleaner as their references go out of scope —
    # each holds only |nodes| rows.
    ranks = (
        nodes.crossJoin(n_tbl)
        .select("node", init.cast(rtype).alias("_pr_r"))
        .localCheckpoint(eager=True)
    )
    ew = e.join(outw, "_pr_s")  # (src, dst, w, out_w) — reused each step

    for _ in range(iterations):
        dang_tbl = F.broadcast(
            ranks.join(
                outw, ranks["node"] == outw["_pr_s"], "left_anti"
            ).agg(
                F.coalesce(F.sum("_pr_r"), F.lit(0).cast(rtype)).alias(
                    "_pr_dang"
                )
            )
        )
        contribs = (
            ew.join(ranks, ew["_pr_s"] == ranks["node"])
            .select(F.col("_pr_d").alias("node"), contrib.alias("_pr_c"))
            .groupBy("node")
            .agg(F.sum("_pr_c").alias("_pr_c"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(n_tbl)
            .crossJoin(dang_tbl)
            .select(
                "node",
                (
                    base + F.coalesce(F.col("_pr_c"), F.lit(0).cast(rtype))
                    + dshare
                ).cast(rtype).alias("_pr_r"),
            )
            .localCheckpoint(eager=True)
        )

    out_name = "rank_scaled" if grid else "rank"
    out = ranks.select("node", F.col("_pr_r").alias(out_name))
    # the returned frame reads from its own checkpoint blocks — every
    # setup cache can release now
    e.unpersist()
    nodes.unpersist()
    outw.unpersist()
    return out


def anchor_terms(
    links: DataFrame,
    dst_url_col: str = "href",
    anchor_col: str = "anchor",
    nofollow_col: "str | None" = "nofollow",
    min_len: int = 2,
) -> DataFrame:
    """Per-target-host anchor-term table ``(dst_host, term, n_links)``
    — the classic off-page relevance/description signal (what OTHER
    pages' link text says a host is about; feeds source labeling and
    crawl prioritization the way host rank feeds quality).

    Terms are lowercase whitespace tokens of the anchor text
    (UNICODE whitespace — ``&nbsp;`` decodes to U+00A0 and must
    separate, so the split is ``(?U)\\s+``, not Java's ASCII-only
    default) with punctuation-only and sub-``min_len`` tokens
    dropped, DEDUPLICATED per link — ``n_links`` counts links whose
    anchor contains the term (the off-page signal), not raw token
    occurrences ("buy buy buy" is one buy-link, not three).
    Nofollow links are excluded by default (the :func:`host_graph`
    policy switch, NULL = followed).  Pure codegen: split + explode
    + one map-side-combinable count aggregate — no Python in the hot
    path, output is |hosts| x |vocab|-sparse, orders below the link
    table."""
    rows = _followed_dst(
        links,
        dst_url_col,
        nofollow_col,
        extra=[F.col(anchor_col).alias("_at")],
    )
    term = F.explode(
        F.array_distinct(
            F.filter(
                F.split(
                    F.lower(F.coalesce(F.col("_at"), F.lit(""))),
                    r"(?U)\s+",
                ),
                lambda t: (F.length(t) >= min_len)
                & t.rlike("[\\p{L}\\p{N}]"),
            )
        )
    )
    return (
        rows.select("dst_host", term.alias("term"))
        .groupBy("dst_host", "term")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
