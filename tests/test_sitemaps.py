"""Sitemap protocol source (sources/sitemaps.py): urlset + index,
namespaces, gzip, tolerance."""

from __future__ import annotations

import gzip

import pandas as pd

from amazon_lookout_for_equipment_python_sdk_spark.sources import (
    sitemaps as SM,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://a.example/page/1</loc>
    <lastmod>2024-01-02</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://a.example/page/2</loc></url>
  <url><lastmod>2024-01-01</lastmod></url><!-- no loc: skipped -->
  <url><loc>https://a.example/p3</loc><priority>junk</priority></url>
</urlset>
"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://b.example/sitemap-a.xml.gz</loc>
    <lastmod>2024-02-01</lastmod></sitemap>
  <sitemap><loc>https://b.example/sitemap-b.xml.gz</loc></sitemap>
</sitemapindex>
"""

NO_NAMESPACE = "<urlset><url><loc>https://c.example/x</loc></url></urlset>"


def test_parse_urlset_fields():
    rows = SM.parse_sitemap_blob("a.example", URLSET)
    assert [r["loc"] for r in rows] == [
        "https://a.example/page/1",
        "https://a.example/page/2",
        "https://a.example/p3",
    ]
    r0 = rows[0]
    assert r0["kind"] == "url" and r0["error"] is None
    assert r0["lastmod"] == "2024-01-02"
    assert r0["changefreq"] == "daily" and r0["priority"] == 0.8
    assert rows[1]["lastmod"] is None
    assert rows[2]["priority"] is None  # junk priority tolerated


def test_parse_index_namespace_free_and_gzip():
    rows = SM.parse_sitemap_blob("b.example", INDEX)
    assert [(r["kind"], r["loc"]) for r in rows] == [
        ("sitemap", "https://b.example/sitemap-a.xml.gz"),
        ("sitemap", "https://b.example/sitemap-b.xml.gz"),
    ]
    assert SM.parse_sitemap_blob("c.example", NO_NAMESPACE)[0]["loc"] == (
        "https://c.example/x"
    )
    gz = gzip.compress(URLSET.encode(), mtime=0)
    assert len(SM.parse_sitemap_blob("a.example", gz)) == 3


def test_parse_tolerance():
    bad = SM.parse_sitemap_blob("x", b"<urlset><url></urlse")
    assert len(bad) == 1 and "xml parse error" in bad[0]["error"]
    wrong = SM.parse_sitemap_blob("x", b"<rss></rss>")
    assert "unknown root" in wrong[0]["error"]
    badgz = SM.parse_sitemap_blob("x", b"\x1f\x8bnot really gzip")
    assert "corrupt gzip" in badgz[0]["error"]
    assert SM.parse_sitemap_blob("x", None) == []


def test_parse_sitemaps_column_operator(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "host": ["a.example", "b.example", "broken.example"],
                "sitemap_xml": [
                    URLSET.encode(),
                    INDEX.encode(),
                    b"<not xml",
                ],
            }
        )
    )
    out = SM.parse_sitemaps(df).collect()
    by_kind = {}
    for r in out:
        by_kind.setdefault(
            r["kind"] if r["error"] is None else "error", []
        ).append(r)
    assert len(by_kind["url"]) == 3
    assert len(by_kind["sitemap"]) == 2
    assert len(by_kind["error"]) == 1
    assert by_kind["error"][0]["source_host"] == "broken.example"
    # discovery feeds the URL gates directly
    from amazon_lookout_for_equipment_python_sdk_spark.operators.urls import (
        url_filter,
    )

    urls = SM.parse_sitemaps(df).filter(
        "kind = 'url' and error is null"
    ).select("loc")
    gated = url_filter(urls, url_col="loc")
    assert gated.count() == 3


def test_corrupt_deflate_and_bomb_degrade_to_error_rows():
    """r14 review: zlib.error (what corrupt DEFLATE data actually
    raises) must yield an error row, not sink the task; and a
    decompression bomb stops at the 50 MB spec cap."""
    import gzip as _gz
    import zlib as _zl

    good = _gz.compress(b"<urlset><url><loc>https://x/1</loc></url></urlset>")
    # flip a byte in the deflate body (past the 10-byte gzip header)
    for flip in range(12, min(len(good) - 9, 40)):
        blob = bytearray(good)
        blob[flip] ^= 0xFF
        rows = SM.parse_sitemap_blob("h", bytes(blob))
        assert len(rows) >= 1  # never raises
        # either an error row or (rare lucky flip) parsed rows
        assert all("loc" in r for r in rows)
    # guaranteed zlib.error reproduction: valid header + garbage body
    junk = good[:10] + b"\x00\xff" * 50
    rows = SM.parse_sitemap_blob("h", junk)
    assert len(rows) == 1 and rows[0]["error"] is not None
    # bomb: 200 MB of zeros compresses to ~200 KB; cap refuses it
    bomb = _gz.compress(b"\x00" * (200 * 1024 * 1024))
    assert len(bomb) < 1024 * 1024
    rows = SM.parse_sitemap_blob("h", bomb)
    assert len(rows) == 1 and "50 MB" in rows[0]["error"]
    del bomb
    _ = _zl  # imported for documentation parity
