"""Sitemap: directive discovery (operators/robots.py robots_sitemaps)."""
from __future__ import annotations

from amazon_lookout_for_equipment_python_sdk_spark.operators.robots import (
    _parse_sitemap_refs,
    robots_sitemaps,
)


def test_parse_sitemap_refs_basic():
    body = (
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Sitemap: https://a.com/sitemap.xml\n"
        "sitemap: https://a.com/news.xml.gz   # comment\n"
    )
    assert _parse_sitemap_refs(body) == [
        "https://a.com/sitemap.xml",
        "https://a.com/news.xml.gz",
    ]


def test_parse_sitemap_refs_group_independent():
    # the directive applies regardless of surrounding groups and may
    # appear before any group, inside one, or after all of them
    body = (
        "Sitemap: https://a.com/pre.xml\n"
        "User-agent: special\n"
        "Sitemap: https://a.com/mid.xml\n"
        "Disallow: /x\n"
        "User-agent: *\n"
        "Allow: /\n"
        "Sitemap: https://a.com/post.xml\n"
    )
    assert _parse_sitemap_refs(body) == [
        "https://a.com/pre.xml",
        "https://a.com/mid.xml",
        "https://a.com/post.xml",
    ]


def test_parse_sitemap_refs_dedups_and_skips_empty():
    body = (
        "Sitemap: https://a.com/s.xml\n"
        "Sitemap: https://a.com/s.xml\n"
        "Sitemap:\n"
        "Sitemap:   \n"
    )
    assert _parse_sitemap_refs(body) == ["https://a.com/s.xml"]


def test_parse_sitemap_refs_url_colon_survives():
    # partition on the FIRST colon only — the scheme colon is payload
    assert _parse_sitemap_refs("Sitemap: http://h/s.xml") == [
        "http://h/s.xml"
    ]


def test_parse_sitemap_refs_malformed_degrades():
    assert _parse_sitemap_refs("not robots at all\n\x00\xff") == []


def test_robots_sitemaps_spark(spark):
    rows = [
        ("A.com", "Sitemap: https://a.com/s1.xml\nSitemap: https://a.com/s2.xml"),
        ("b.com", "User-agent: *\nDisallow: /"),  # no directive -> absent
        ("c.com", None),
        (None, "Sitemap: https://x.com/s.xml"),
    ]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    got = sorted(
        (r.host, r.sitemap_url)
        for r in robots_sitemaps(df).collect()
    )
    assert got == [
        ("a.com", "https://a.com/s1.xml"),
        ("a.com", "https://a.com/s2.xml"),
    ]


def test_robots_sitemaps_binary_body(spark):
    df = spark.createDataFrame(
        [("h.io", b"Sitemap: https://h.io/s.xml\n")],
        "host string, robots_txt binary",
    )
    got = robots_sitemaps(df).collect()
    assert [(r.host, r.sitemap_url) for r in got] == [
        ("h.io", "https://h.io/s.xml")
    ]
