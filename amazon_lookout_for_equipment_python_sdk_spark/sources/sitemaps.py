"""Sitemap protocol source — URL discovery for the crawl chain.

Parses the sitemaps.org protocol (https://www.sitemaps.org/protocol.html,
the format robots.txt ``Sitemap:`` lines point at) with only stdlib
``xml.etree``: ``<urlset>`` pages and ``<sitemapindex>`` indexes, plain
or gzipped, namespaced or (tolerantly) not.  The output is a uniform
row stream ``(source_host, kind, loc, lastmod, changefreq, priority)``
— ``kind='url'`` rows feed :func:`operators.urls.url_filter` /
``robots_filter``; ``kind='sitemap'`` rows are index entries the
caller's fetch loop follows (fetching is external by design: this
engine transforms bytes, it does not crawl).

Scale design: one Arrow kernel over (host, blob) rows — a sitemap file
caps at 50k URLs / 50 MB uncompressed by spec, so one file is always
task-sized; a million-host sitemap corpus parallelizes over rows.
Malformed XML yields ONE error row per file (``error`` column), never
an exception — same tolerance contract as the WARC parser.
"""

from __future__ import annotations

import gzip
import io
import re
import zlib

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (API symmetry)
from pyspark.sql import types as T

SITEMAP_SCHEMA = T.StructType(
    [
        T.StructField("source_host", T.StringType(), True),
        T.StructField("kind", T.StringType(), True),
        T.StructField("loc", T.StringType(), True),
        T.StructField("lastmod", T.StringType(), True),
        T.StructField("changefreq", T.StringType(), True),
        T.StructField("priority", T.DoubleType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

#: sitemaps.org cap: one file is at most 50 MB UNCOMPRESSED — also the
#: decompression-bomb bound for untrusted gzipped blobs.
_MAX_UNCOMPRESSED = 50 * 1024 * 1024

#: strip any XML namespace from a tag: '{ns}loc' -> 'loc'.  Real-world
#: sitemaps use the canonical namespace, no namespace, or typo'd ones —
#: the tag LOCAL NAMES are the stable contract.
_NS_RE = re.compile(r"^\{.*\}")


def _local(tag: str) -> str:
    return _NS_RE.sub("", tag)


def parse_sitemap_blob(
    host: "str | None", blob: "bytes | str | None"
) -> "list[dict]":
    """Rows (dicts matching :data:`SITEMAP_SCHEMA`) for one sitemap
    file.  Gzip detected by magic; malformed XML degrades to one error
    row; unknown elements are ignored (the spec says consumers must
    tolerate extensions)."""
    base = {
        "source_host": host,
        "kind": None,
        "loc": None,
        "lastmod": None,
        "changefreq": None,
        "priority": None,
        "error": None,
    }
    if blob is None:
        return []
    if isinstance(blob, str):
        blob = blob.encode("utf-8")
    if blob[:2] == b"\x1f\x8b":
        # zlib.error is what corrupt DEFLATE data actually raises from
        # GzipFile.read() (BadGzipFile/EOFError only cover header and
        # truncation corruption) — letting it escape sank the whole
        # Spark task and every other (host, blob) row in the batch
        # (r14 review).  The read is CAPPED at the spec's 50 MB
        # uncompressed limit + 1: a small decompression bomb otherwise
        # inflates to executor-OOM (the cap the module docstring
        # already claims).
        try:
            f = gzip.GzipFile(fileobj=io.BytesIO(blob))
            blob = f.read(_MAX_UNCOMPRESSED + 1)
        except (OSError, EOFError, zlib.error) as e:
            return [dict(base, error=f"corrupt gzip: {e}")]
        if len(blob) > _MAX_UNCOMPRESSED:
            return [
                dict(
                    base,
                    error=(
                        "sitemap exceeds the 50 MB uncompressed spec "
                        "cap; refusing to inflate further"
                    ),
                )
            ]
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(blob)
    except ET.ParseError as e:
        return [dict(base, error=f"xml parse error: {e}")]
    root_kind = _local(root.tag)
    if root_kind == "urlset":
        child_tag, kind = "url", "url"
    elif root_kind == "sitemapindex":
        child_tag, kind = "sitemap", "sitemap"
    else:
        return [dict(base, error=f"unknown root element <{root_kind}>")]
    rows = []
    for el in root:
        if _local(el.tag) != child_tag:
            continue
        fields = {
            _local(c.tag): (c.text or "").strip() for c in el
        }
        loc = fields.get("loc")
        if not loc:
            continue  # spec: <loc> is required; skip junk entries
        pr = fields.get("priority")
        try:
            priority = float(pr) if pr else None
        except ValueError:
            priority = None
        rows.append(
            dict(
                base,
                kind=kind,
                loc=loc,
                lastmod=fields.get("lastmod") or None,
                changefreq=fields.get("changefreq") or None,
                priority=priority,
            )
        )
    return rows


def parse_sitemaps(
    df: DataFrame,
    host_col: str = "host",
    blob_col: str = "sitemap_xml",
) -> DataFrame:
    """Explode (host, sitemap bytes/string) rows into
    :data:`SITEMAP_SCHEMA` — ``kind='url'`` entries feed the URL gates,
    ``kind='sitemap'`` entries are index children for the caller's
    fetch loop, ``error`` rows surface malformed files without sinking
    the batch."""
    src = df.select(
        F.col(host_col).cast("string").alias("_h"),
        F.col(blob_col).alias("_b"),
    )

    def explode(batches):
        for pdf in batches:
            rows = []
            for host, blob in zip(pdf["_h"], pdf["_b"]):
                b = (
                    bytes(blob)
                    if isinstance(blob, (bytes, bytearray, memoryview))
                    else blob
                )
                rows.extend(parse_sitemap_blob(host, b))
            if rows:
                yield pd.DataFrame(rows)

    return src.mapInPandas(explode, schema=SITEMAP_SCHEMA)
