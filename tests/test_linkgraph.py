"""Link extraction + host graph + PageRank (operators/linkgraph.py)."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.operators.linkgraph import (
    extract_links,
    host_graph,
    html_extract_links,
    pagerank,
)


# ---------------------------------------------------------------------------
# extract_links (pure Python kernel)
# ---------------------------------------------------------------------------


def test_extract_links_basic():
    html = (
        '<p>See <a href="https://a.com/x">the A page</a> and '
        '<a href="/rel" rel="nofollow">rel</a>.</p>'
    )
    links = extract_links(html, base_url="https://b.com/dir/page")
    assert links == [
        ("https://a.com/x", "the A page", False),
        ("https://b.com/rel", "rel", True),
    ]


def test_extract_links_no_base_keeps_relative():
    assert extract_links('<a href="/rel">r</a>') == [("/rel", "r", False)]


def test_extract_links_drops_fragment_and_empty():
    html = '<a href="#top">t</a><a href="">e</a><a>none</a>'
    assert extract_links(html) == []


def test_extract_links_nested_anchor_implicit_close():
    # HTML5 tree builder: a second <a> start tag implicitly closes the
    # open anchor — browsers never nest anchors
    html = '<a href="/out">a <a href="/in">b</a> c</a>'
    links = extract_links(html)
    assert links == [("/out", "a", False), ("/in", "b", False)]


def test_extract_links_unclosed_sibling_anchors_keep_hrefs():
    # the common broken-nav case: no </a> anywhere — every sibling
    # anchor still keeps its own href (implicit-close, not nesting)
    html = '<a href="/1">one <a href="/2">two <a href="/3">three'
    assert extract_links(html) == [
        ("/1", "one", False),
        ("/2", "two", False),
        ("/3", "three", False),
    ]


def test_extract_links_dropped_subtrees_emit_no_links():
    # an <a> inside noscript/template/svg/iframe fallback content is
    # not a rendered link — no edge, same drop policy as html.py
    for wrap in ("noscript", "template", "svg", "iframe"):
        html = f'<{wrap}><a href="/x">x</a></{wrap}><a href="/y">y</a>'
        assert extract_links(html) == [("/y", "y", False)], wrap


def test_extract_links_unclosed_anchor_flushes():
    assert extract_links('<a href="/x">dangling') == [
        ("/x", "dangling", False)
    ]


def test_extract_links_script_text_not_anchor_text():
    html = '<a href="/x">ok<script>var a=1;</script></a>'
    assert extract_links(html) == [("/x", "ok", False)]


def test_extract_links_rel_multi_token():
    html = '<a href="/x" rel="external NOFOLLOW noopener">x</a>'
    assert extract_links(html)[0][2] is True


def test_extract_links_broken_html_degrades():
    # stray < and & degrade to anchor data, not an exception
    assert extract_links("<a href='/x'><<<&&") == [("/x", "<<<&&", False)]


# ---------------------------------------------------------------------------
# html_extract_links / host_graph (Spark)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def links_df(spark):
    rows = [
        (
            1,
            "https://a.com/p",
            '<a href="https://b.com/1">b</a>'
            '<a href="/local">self</a>'
            '<a href="https://c.com/1" rel="nofollow">c</a>'
            '<a href="https://b.com/2">b2</a>',
        ),
        (2, "https://b.com/p", '<a href="https://a.com/">a</a>'),
        (3, "https://d.com/p", None),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string, html string")


def test_html_extract_links(spark, links_df):
    out = html_extract_links(
        links_df, html_col="html", id_col="doc_id", base_col="url"
    ).orderBy("doc_id", "href")
    got = [(r.doc_id, r.href, r.anchor, r.nofollow) for r in out.collect()]
    assert got == [
        (1, "https://a.com/local", "self", False),
        (1, "https://b.com/1", "b", False),
        (1, "https://b.com/2", "b2", False),
        (1, "https://c.com/1", "c", True),
        (2, "https://a.com/", "a", False),
    ]


def test_html_extract_links_null_id_row_skipped(spark):
    # a NULL doc_id renders as NaN in the pandas id column; it must be
    # skipped row-locally, not fail the whole Arrow task's LongType
    # conversion (the module's one-bad-row tolerance stance)
    rows = [
        (None, "https://x.com/p", '<a href="https://y.com/1">y</a>'),
        (7, "https://x.com/q", '<a href="https://z.com/1">z</a>'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, html string")
    out = html_extract_links(
        df, html_col="html", id_col="doc_id", base_col="url"
    )
    got = [(r.doc_id, r.href) for r in out.collect()]
    assert got == [(7, "https://z.com/1")]


def test_host_graph(spark, links_df):
    links = html_extract_links(
        links_df, html_col="html", id_col="doc_id", base_col="url"
    ).join(
        links_df.select("doc_id", F.col("url").alias("page_url")), "doc_id"
    )
    links = links.withColumn(
        "src_host",
        F.lower(F.try_parse_url(F.col("page_url"), F.lit("HOST"))),
    )
    g = host_graph(links).orderBy("src_host", "dst_host").collect()
    # nofollow c.com edge dropped; a.com -> a.com self-loop dropped
    assert [(r.src_host, r.dst_host, r.n_links) for r in g] == [
        ("a.com", "b.com", 2),
        ("b.com", "a.com", 1),
    ]


def test_host_graph_null_nofollow_means_followed(spark):
    # NULL rel flag = "not recorded", which must NOT drop the edge
    rows = [("a.com", "https://b.com/x", None), ("a.com", "https://c.com/y", True)]
    df = spark.createDataFrame(
        rows, "src_host string, href string, nofollow boolean"
    )
    g = host_graph(df).collect()
    assert [(r.src_host, r.dst_host) for r in g] == [("a.com", "b.com")]


def test_host_graph_keep_nofollow_and_self(spark, links_df):
    links = html_extract_links(
        links_df, html_col="html", id_col="doc_id", base_col="url"
    ).withColumn("src_host", F.lit("a.com"))
    g = host_graph(links, nofollow_col=None, drop_self=False)
    assert g.agg(F.sum("n_links")).collect()[0][0] == 5


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "src_host string, dst_host string, n_links long"
    )


def test_pagerank_cycle_uniform(spark):
    # a -> b -> c -> a: perfectly symmetric, rank stays uniform
    e = _edges(spark, [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)])
    out = pagerank(e, iterations=5)
    ranks = {r.node: r.rank for r in out.collect()}
    for v in ranks.values():
        assert v == pytest.approx(1 / 3, abs=1e-12)


def test_pagerank_mass_conserved_with_dangling(spark):
    # c is dangling (no out-edges) — mass must still sum to 1
    e = _edges(spark, [("a", "b", 1), ("a", "c", 3), ("b", "c", 1)])
    out = pagerank(e, iterations=4)
    ranks = {r.node: r.rank for r in out.collect()}
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)
    # c receives 3x a->c weight plus everything b forwards: strictly top
    assert ranks["c"] > ranks["b"]


def test_pagerank_matches_numpy_reference(spark):
    edges = [("a", "b", 2), ("b", "c", 1), ("c", "a", 1), ("a", "c", 1)]
    e = _edges(spark, edges)
    out = pagerank(e, iterations=7, damping=0.85)
    got = {r.node: r.rank for r in out.collect()}

    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    r = [1.0 / n] * n
    for _ in range(7):
        nxt = [(1 - 0.85) / n] * n
        dang = sum(
            r[idx[v]] for v in nodes if v not in outw
        )
        for s, d, w in edges:
            nxt[idx[d]] += 0.85 * r[idx[s]] * w / outw[s]
        for i in range(n):
            nxt[i] += 0.85 * dang / n
        r = nxt
    for v in nodes:
        assert got[v] == pytest.approx(r[idx[v]], rel=1e-9)


def test_pagerank_grid_deterministic_and_close_to_float(spark):
    edges = [("a", "b", 2), ("b", "c", 1), ("c", "a", 1), ("a", "c", 1)]
    e = _edges(spark, edges)
    scale = 10**9
    g1 = {
        r.node: r.rank_scaled
        for r in pagerank(e, iterations=3, grid_scale=scale).collect()
    }
    # repartitioned input -> identical bits (the grid contract)
    g2 = {
        r.node: r.rank_scaled
        for r in pagerank(
            e.repartition(7), iterations=3, grid_scale=scale
        ).collect()
    }
    assert g1 == g2
    f = {
        r.node: r.rank
        for r in pagerank(e, iterations=3).collect()
    }
    for v, s in g1.items():
        assert s / scale == pytest.approx(f[v], abs=1e-6)


def test_pagerank_duplicate_edges_sum_weights(spark):
    e1 = _edges(spark, [("a", "b", 1), ("a", "b", 2), ("b", "a", 1)])
    e2 = _edges(spark, [("a", "b", 3), ("b", "a", 1)])
    r1 = {r.node: r.rank for r in pagerank(e1, iterations=3).collect()}
    r2 = {r.node: r.rank for r in pagerank(e2, iterations=3).collect()}
    assert r1 == pytest.approx(r2)


def test_pagerank_grid_duplicate_edges_bit_exact(spark):
    # grid mode floors per EDGE ROW — without the internal pre-
    # aggregation, split rows would floor independently and the bits
    # would depend on the caller's pre-aggregation (three-edge graph
    # where floor(r·1/3ow)+floor(r·2/3ow) != floor(r·3/3ow))
    e1 = _edges(spark, [("a", "b", 1), ("a", "b", 2), ("b", "c", 1), ("c", "a", 1)])
    e2 = _edges(spark, [("a", "b", 3), ("b", "c", 1), ("c", "a", 1)])
    g1 = {
        r.node: r.rank_scaled
        for r in pagerank(e1, iterations=3, grid_scale=10**9).collect()
    }
    g2 = {
        r.node: r.rank_scaled
        for r in pagerank(e2, iterations=3, grid_scale=10**9).collect()
    }
    assert g1 == g2


def test_pagerank_zero_iterations_uniform(spark):
    e = _edges(spark, [("a", "b", 1)])
    out = {r.node: r.rank for r in pagerank(e, iterations=0).collect()}
    assert out == {"a": 0.5, "b": 0.5}


def test_pagerank_validates_args(spark):
    e = _edges(spark, [("a", "b", 1)])
    with pytest.raises(ValueError):
        pagerank(e, iterations=-1)
    with pytest.raises(ValueError):
        pagerank(e, damping=1.5)
    with pytest.raises(ValueError):
        pagerank(e, damping=0.855, grid_scale=10**9)


# ---------------------------------------------------------------------------
# anchor_terms
# ---------------------------------------------------------------------------


def test_anchor_terms_counts_and_policies(spark):
    from amazon_lookout_for_equipment_python_sdk_spark.operators.linkgraph import (
        anchor_terms,
    )

    rows = [
        ("https://b.com/1", "Great Spark Guide", False),
        ("https://b.com/2", "spark  guide!", False),
        ("https://b.com/3", "a ... --", False),          # all tokens dropped
        ("https://c.com/1", "hidden", True),             # nofollow: excluded
        ("https://d.com/1", "null-rel stays", None),     # NULL = followed
        (None, "no host", False),
    ]
    df = spark.createDataFrame(rows, "href string, anchor string, nofollow boolean")
    got = {
        (r.dst_host, r.term): r.n_links
        for r in anchor_terms(df).collect()
    }
    assert got == {
        ("b.com", "great"): 1,
        ("b.com", "spark"): 2,
        ("b.com", "guide"): 1,
        ("b.com", "guide!"): 1,
        ("d.com", "null-rel"): 1,
        ("d.com", "stays"): 1,
    }


def test_anchor_terms_null_anchor_safe(spark):
    from amazon_lookout_for_equipment_python_sdk_spark.operators.linkgraph import (
        anchor_terms,
    )

    df = spark.createDataFrame(
        [("https://b.com/x", None, False)],
        "href string, anchor string, nofollow boolean",
    )
    assert anchor_terms(df).count() == 0


def test_anchor_terms_dedup_within_link_and_unicode_ws(spark):
    from amazon_lookout_for_equipment_python_sdk_spark.operators.linkgraph import (
        anchor_terms,
    )

    rows = [
        # repeated token in ONE anchor: n_links counts links containing
        # the term, not raw occurrences
        ("https://b.com/1", "buy buy buy cheap", False),
        # &nbsp; decodes to U+00A0 — unicode whitespace must separate
        ("https://b.com/2", "free\u00a0books", False),
    ]
    df = spark.createDataFrame(
        rows, "href string, anchor string, nofollow boolean"
    )
    got = {(r.dst_host, r.term): r.n_links for r in anchor_terms(df).collect()}
    assert got == {
        ("b.com", "buy"): 1,
        ("b.com", "cheap"): 1,
        ("b.com", "free"): 1,
        ("b.com", "books"): 1,
    }
