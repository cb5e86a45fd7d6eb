"""HTML -> text extraction + boilerplate removal (operators/html.py)."""

from __future__ import annotations

from amazon_lookout_for_equipment_python_sdk_spark.operators import html as h

_PAGE = """
<html><head><title>T</title>
<style>body { color: red }</style>
<script>var x = "the and of to in is are was were ignore me";</script>
</head><body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>
<article>
<h1>A real article about the engine</h1>
<p>This is the first real paragraph of the article and it has enough
words that the classifier should keep it because it is made of normal
English prose with the usual function words in it.</p>
<p>Second paragraph is also real content, and it too is long enough to
be kept by the heuristics that we are testing in this module.</p>
</article>
<footer><a href="/tos">Terms</a> | <a href="/privacy">Privacy</a></footer>
</body></html>
"""


def test_segments_scored_and_classified():
    segs = h.extract_segments(_PAGE)
    texts = [s["text"] for s in segs]
    assert any("first real paragraph" in t for t in texts)
    # script/style content never leaks
    assert not any("color: red" in t or "var x" in t for t in texts)
    good = [s for s in segs if s["good"]]
    bad = [s for s in segs if not s["good"]]
    assert any("first real paragraph" in s["text"] for s in good)
    # nav and footer are link-dense -> boilerplate
    assert any("Home" in s["text"] for s in bad)
    assert any("Terms" in s["text"] for s in bad)
    assert not any("Home" in s["text"] or "Terms" in s["text"] for s in good)


def test_html_to_text_joins_good_segments():
    txt = h.html_to_text(_PAGE)
    assert "first real paragraph" in txt and "Second paragraph" in txt
    assert "Home" not in txt and "Privacy" not in txt


def test_link_density_math():
    segs = h.extract_segments('<p><a href="x">linked</a> plain</p>')
    (s,) = segs
    assert s["link_density"] == len("linked") / len("linked plain")


def test_malformed_and_empty_html_are_safe():
    assert h.extract_segments("") == []
    assert h.html_to_text(None) == ""
    # unterminated tags / garbage: no crash
    assert isinstance(h.extract_segments("<p><div><<<>??<a"), list)


def test_html_extract_text_dataframe(spark):
    rows = [(1, _PAGE), (2, "<p>tiny</p>"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = {r["doc_id"]: r for r in h.html_extract_text(df).collect()}
    assert "first real paragraph" in out[1]["text"]
    assert 0.0 < out[1]["boilerplate_ratio"] < 1.0
    assert out[1]["n_good"] >= 2 and out[1]["n_segments"] > out[1]["n_good"]
    assert out[2]["text"] is None and out[2]["n_good"] == 0  # too short
    assert out[3]["text"] is None and out[3]["n_segments"] == 0


def test_extracted_text_feeds_corpus_layer(spark):
    """The crawl-to-corpus chain: extraction output drops straight into
    the existing quality filter."""
    from amazon_lookout_for_equipment_python_sdk_spark.operators.text import (
        quality_filter,
    )

    df = spark.createDataFrame([(1, _PAGE)], "doc_id long, html string")
    texts = h.html_extract_text(df).filter("text is not null")
    kept = quality_filter(texts).collect()
    assert len(kept) == 1


def test_chain_wrapper_extracts_to_pad_plus_text_identity():
    """The crawl_chain_gates html leg depends on this identity: the
    deterministic boilerplate wrapper (title/nav/article/footer)
    reduces to EXACTLY pad + ' ' + text with 4 segments / 1 good for
    any single-spaced corpus text — the oracle writes that string
    down, so drift here flips the driver hash."""
    from amazon_lookout_for_equipment_python_sdk_spark.plans.corpus_q import (
        _HTML_PAD,
    )

    assert len(_HTML_PAD) >= 120  # good-via-length, stopword-free-proof
    assert "  " not in _HTML_PAD and _HTML_PAD == _HTML_PAD.strip()
    for t in ("short", "x " * 30, "key agg row scan slow fast value"):
        t = t.strip()
        page = (
            "<html><head><title>Doc</title>"
            "<style>.x{c:1}</style></head><body>"
            '<nav><a href="/">home</a> <a href="/a">fr</a></nav>'
            "<p>" + _HTML_PAD + " " + t + "</p>"
            '<footer><a href="/c">contact</a></footer>'
            "</body></html>"
        )
        segs = h.extract_segments(page)
        assert [s["good"] for s in segs] == [False, False, True, False]
        assert segs[2]["text"] == _HTML_PAD + " " + t
        assert h.html_to_text(page) == _HTML_PAD + " " + t
