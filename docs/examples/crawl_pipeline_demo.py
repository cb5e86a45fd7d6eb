"""Runnable tour of the crawl-to-corpus layer (r12; discovery r13).

    python docs/examples/crawl_pipeline_demo.py [sf_dir]

The end-to-end crawl shape every LLM data pipeline runs, each step the
operator the engine ships:

  URL discovery: sitemap index + urlsets (parse_sitemaps)
  -> canonical dedup keys (canonicalize_url) before any fetch
  -> polite per-host fetch batches (frontier_batches)
  raw HTTP captures -> WARC shards (write_warc, warcinfo-leading)
  -> shard-parallel tolerant parse (read_warc, record-type pushdown)
  -> HTTP body split incl. chunked/gzip decode + charset-aware text
     decode (with_http_text)
  -> URL gates: scheme + domain blocklist (url_filter, suffix semi-join)
  -> boilerplate removal (html_extract_text)
  -> Gopher repetition rules (gopher_repetition)
  -> quality gate (quality_filter) -> exact dedup (dedup_exact)

Temp dirs hold the shard state; everything is deterministic.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import pandas as pd

from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.operators.html import (
    html_extract_text,
)
from amazon_lookout_for_equipment_python_sdk_spark.operators.text import (
    gopher_repetition,
    quality_filter,
)
from amazon_lookout_for_equipment_python_sdk_spark.operators.dedup import (
    dedup_exact,
)
from amazon_lookout_for_equipment_python_sdk_spark.operators.frontier import (
    frontier_batches,
)
from amazon_lookout_for_equipment_python_sdk_spark.operators.robots import (
    robots_filter,
)
from amazon_lookout_for_equipment_python_sdk_spark.operators.urls import (
    canonicalize_url,
    url_filter,
)
from amazon_lookout_for_equipment_python_sdk_spark.sources.sitemaps import (
    parse_sitemaps,
)
from amazon_lookout_for_equipment_python_sdk_spark.session import get_spark
from amazon_lookout_for_equipment_python_sdk_spark.sources.warc import (
    read_warc,
    with_http_text,
    write_warc,
)


def _fake_captures(spark, n=60):
    """Deterministic raw HTTP captures: mostly article pages, a few
    blocked-domain hits, one duplicated page, one boilerplate-only."""
    rows = []
    para = (
        "This is the main article content with enough words that the "
        "boilerplate heuristics keep it as a good segment of the page."
    )
    for i in range(n):
        host = "ads.blocked.example" if i % 10 == 0 else f"site{i % 7}.org"
        body = (
            f"<html><body><p>{para} Article number {i % 50}.</p>"
            f"<div><a href='/x'>nav</a></div></body></html>"
        )
        http = (
            "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        )
        rows.append(
            {
                "url": f"https://{host}/articles/{i % 50}",
                "raw": http.encode(),
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows))


def _discovery_prologue(spark) -> None:
    """Sitemaps -> canonical URLs: the fetch frontier BEFORE any HTTP
    traffic (r13 additions).  Canonicalization collapses the variants
    a naive frontier would fetch twice."""
    urlset = (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        + "".join(
            f"<url><loc>https://Site0.ORG:443/articles/{i}"
            f"{'?utm_source=feed' if i % 2 else ''}</loc></url>"
            for i in range(8)
        )
        + "<url><loc>https://site0.org/articles/0#frag</loc></url>"
        + "</urlset>"
    )
    sm = spark.createDataFrame(
        pd.DataFrame({"host": ["site0.org"], "sitemap_xml": [urlset]})
    )
    urls = parse_sitemaps(sm).filter("kind = 'url' and error is null")
    canon = canonicalize_url(urls, url_col="loc")
    n_raw = canon.count()
    targets = canon.select("canonical_url").distinct()
    n_canon = targets.count()
    batches = frontier_batches(
        targets, url_col="canonical_url", per_host_per_batch=2
    )
    n_batches = batches.agg(F.max("fetch_batch")).collect()[0][0] + 1
    print(
        f"-- discovery: {n_raw} sitemap locs -> "
        f"{n_canon} canonical fetch targets -> "
        f"{n_batches} polite fetch batches (k=2/host)"
    )


def main() -> None:
    spark = get_spark("crawl-demo", cpus=4)
    _discovery_prologue(spark)
    captures = _fake_captures(spark)

    with tempfile.TemporaryDirectory() as work:
        shards = os.path.join(work, "crawl")
        manifest = write_warc(
            captures, shards, n_shards=4, payload_col="raw",
            record_type="response",
            content_type="application/http; msgtype=response",
        )
        print("-- WARC shards written:")
        manifest.show(truncate=False)

        records = with_http_text(
            read_warc(spark, shards, record_types=["response"]).filter(
                F.col("error").isNull()
            ),
            text_col="html",
        )

        # charset-aware decode (r13): header/meta-declared codecs win,
        # UTF-8 second, windows-1252 total fallback -- a blind UTF-8
        # F.decode garbles the legacy-charset share of a real crawl
        docs = records.select(
            F.col("target_uri").alias("url"), "html", "charset"
        )
        block = spark.createDataFrame(
            pd.DataFrame({"domain": ["blocked.example"]})
        )
        gated = url_filter(docs, blocked_domains=block)
        print(
            f"-- URL gate: {docs.count()} captures -> "
            f"{gated.count()} after scheme + blocklist"
        )

        # robots politeness gate (r13): site0.org disallows /articles/4*
        robots = spark.createDataFrame(
            pd.DataFrame(
                {
                    "host": ["site0.org"],
                    "robots_txt": [
                        "User-agent: *\nDisallow: /articles/4\n"
                    ],
                }
            )
        )
        polite = robots_filter(gated, robots)
        print(
            f"-- robots gate: {gated.count()} -> {polite.count()} "
            f"after per-host RFC 9309 rules"
        )
        gated = polite

        extracted = html_extract_text(
            gated.select(
                F.xxhash64("url").alias("doc_id"), F.col("html")
            ),
            html_col="html",
        ).filter(F.length("text") > 0)

        rep = gopher_repetition(extracted)
        clean_ids = rep.filter(
            (F.col("dup_line_frac") < 0.3)
            & (F.col("top_ngram_char_frac") < 0.5)
        ).select("doc_id")
        survivors = extracted.join(clean_ids, "doc_id", "left_semi")
        quality = quality_filter(survivors, min_tokens=10)
        deduped = dedup_exact(quality.select("doc_id", "text"))
        print(
            f"-- extract {extracted.count()} -> repetition-clean "
            f"{survivors.count()} -> quality {quality.count()} -> "
            f"dedup {deduped.count()}"
        )
        deduped.select("keep_id", "n_dups").orderBy("keep_id").show(5)


if __name__ == "__main__":
    main()
