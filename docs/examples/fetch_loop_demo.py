"""Reference fetch loop: walking a frontier plan politely (r14).

    python docs/examples/fetch_loop_demo.py [sf_dir]

The engine deliberately does NOT crawl — it transforms bytes
(sources/warc.py reads captures, operators/frontier.py emits the fetch
PLAN).  This example is the missing seam between discovery and capture:
a reference driver that walks ``frontier_batches`` output batch by
batch, honors per-host ``Crawl-delay`` from ``robots_delays``, fetches
each URL (here: a deterministic offline fake; swap ``fetch_one`` for a
real HTTP client in production), and feeds the captures straight back
into ``write_warc`` — closing the loop

    sitemap -> canonicalize -> robots gate -> frontier plan
        -> [THIS LOOP: fetch] -> WARC shards -> read_warc -> corpus

Design notes (what a production version keeps):

- **The plan is the contract.**  Batch b+1 never starts before batch b
  finishes, so "at most k requests per host per batch" plus a per-batch
  period gives every host its declared rate.  Within a batch, hosts
  are independent — fetch them concurrently; URLs of ONE host run
  sequentially with ``crawl_delay_s`` sleeps between them.
- **Batches collect driver-side on purpose.**  A fetch batch is
  politeness-bound (k URLs/host), i.e. tiny next to the corpus — the
  network loop is the bottleneck, not the rows.  The CAPTURES go back
  through Spark immediately; payload bytes never accumulate beyond one
  batch.
- **Failures are rows, not exceptions** — same tolerance contract as
  read_warc: a fetch error becomes a capture with an HTTP error status
  so the archive records the attempt.

Offline by construction: ``fetch_one`` synthesizes a deterministic
HTTP/1.1 response for any URL (the engine's test corpora do the same),
so this demo runs with no network and asserts the round trip.
"""

from __future__ import annotations

import asyncio
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import pandas as pd

from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.operators.frontier import (
    frontier_batches,
)
from amazon_lookout_for_equipment_python_sdk_spark.operators.robots import (
    robots_delays,
    robots_filter,
)
from amazon_lookout_for_equipment_python_sdk_spark.operators.urls import (
    canonicalize_url,
)
from amazon_lookout_for_equipment_python_sdk_spark.session import get_spark
from amazon_lookout_for_equipment_python_sdk_spark.sources.warc import (
    read_warc,
    write_warc,
)


def fetch_one(url: str) -> bytes:
    """Deterministic offline stand-in for an HTTP GET.

    Production swap-in (stdlib only)::

        import urllib.request
        with urllib.request.urlopen(url, timeout=30) as r:
            body = r.read()
            head = f"HTTP/1.1 {r.status} OK\\r\\n" + "".join(
                f"{k}: {v}\\r\\n" for k, v in r.headers.items())
        return head.encode() + b"\\r\\n" + body

    (or aiohttp for true async concurrency — this loop only awaits
    ``asyncio.sleep``, so a blocking client still honors the delays
    via ``loop.run_in_executor``.)
    """
    body = f"page at {url}".encode()
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )


async def _fetch_host(host, urls, delay_s, results):
    """One host's slice of a batch: sequential, delay between requests."""
    loop = asyncio.get_running_loop()
    for i, url in enumerate(urls):
        if i:
            await asyncio.sleep(delay_s)
        try:
            # run_in_executor keeps a BLOCKING fetch_one off the event
            # loop so other hosts' delays keep ticking concurrently
            payload = await loop.run_in_executor(None, fetch_one, url)
        except Exception as exc:  # noqa: BLE001 — record, don't raise
            payload = (
                b"HTTP/1.1 599 Fetch Error\r\n\r\n"
                + str(exc).encode("utf-8", "replace")
            )
        results.append((url, payload))


async def _fetch_batch(rows, delays, default_delay_s):
    """Fetch one frontier batch: hosts concurrent, per-host sequential."""
    by_host: dict = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r["url"])
    results: list = []
    await asyncio.gather(
        *(
            _fetch_host(h, urls, delays.get(h, default_delay_s), results)
            for h, urls in by_host.items()
        )
    )
    return results


def run_fetch_loop(
    spark,
    plan,
    out_dir: str,
    delays: "dict[str, float]",
    default_delay_s: float = 0.01,
    batch_period_s: float = 0.2,
    n_shards: int = 4,
) -> list:
    """Walk ``plan`` (url, host, fetch_batch) in batch order; write one
    WARC shard set per batch under ``out_dir/bN``.  Returns the
    shard directories written.

    ``batch_period_s`` is the politeness floor BETWEEN batches: if a
    batch finishes early the loop sleeps out the remainder, so a host
    scheduled k=1 per batch (exactly the slow hosts Crawl-delay
    protects) is still spaced ``batch_period_s`` apart across batch
    boundaries.  Choose it >= every host's delay — the same period the
    ``k = floor(period / delay)`` mapping was derived from.  An empty
    plan writes nothing and returns []."""
    n_batches = plan.agg(F.max("fetch_batch")).first()[0]
    if n_batches is None:
        return []
    outs = []
    for b in range(int(n_batches) + 1):
        rows = plan.filter(F.col("fetch_batch") == b).collect()
        t0 = time.monotonic()
        captures = asyncio.run(_fetch_batch(rows, delays, default_delay_s))
        dt = time.monotonic() - t0
        cap_df = spark.createDataFrame(
            pd.DataFrame(captures, columns=["url", "http"])
        )
        shard_dir = os.path.join(out_dir, f"b{b}")
        write_warc(
            cap_df,
            shard_dir,
            n_shards=n_shards,
            payload_col="http",
            record_type="response",
            content_type="application/http; msgtype=response",
        )
        outs.append(shard_dir)
        print(f"batch {b}: fetched {len(captures)} urls in {dt:.2f}s")
        if b < int(n_batches) and dt < batch_period_s:
            time.sleep(batch_period_s - dt)
    return outs


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("fetch-loop-demo")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # --- discovery + politeness, exactly as crawl_pipeline_demo ------
    urls = docs.limit(60).select(
        F.concat(
            F.lit("https://"),
            F.col("source"), F.lit(".example.com"),
            F.lit("/"), F.col("lang"),
            F.lit("/"), F.col("doc_id").cast("string"),
            F.lit("?utm_source=demo"),
        ).alias("loc")
    )
    canon = canonicalize_url(urls, url_col="loc").select(
        F.col("canonical_url").alias("url")
    )
    robots = (
        docs.select("source").distinct().select(
            F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
            F.concat(
                F.lit("User-agent: *\nAllow: /\n"),
                F.when(
                    F.substring("source", 4, 8).cast("int") % 2 == 1,
                    F.lit("Crawl-delay: 0.05\n"),
                ).otherwise(F.lit("")),
            ).alias("robots_txt"),
        )
    )
    allowed = robots_filter(canon, robots)
    delay_rows = robots_delays(robots).collect()
    delays = {r["host"]: r["crawl_delay_s"] for r in delay_rows}
    # delay -> per-batch cap: 0.2s batch period / 0.05s delay = 4/batch
    k_tbl = spark.createDataFrame(
        pd.DataFrame(
            {"host": list(delays), "k": [max(int(0.2 / d), 1) for d in delays.values()]}
        )
    ) if delays else None
    plan = frontier_batches(
        allowed, per_host_per_batch=2, per_host_k=k_tbl
    ).select(
        "url",
        F.lower(F.try_parse_url("url", F.lit("HOST"))).alias("host"),
        "fetch_batch",
    )

    # --- the loop ----------------------------------------------------
    with tempfile.TemporaryDirectory() as tmp:
        shard_dirs = run_fetch_loop(spark, plan, tmp, delays)
        back = read_warc(
            spark, os.path.join(tmp, "b*"), record_types=["response"]
        ).filter(F.col("error").isNull())
        n_in = plan.count()
        n_out = back.count()
        print(f"fetched+archived {n_out}/{n_in} across "
              f"{len(shard_dirs)} batches")
        assert n_out == n_in, "round trip lost captures"
        sample = back.select("target_uri").orderBy("target_uri").first()
        print("sample capture:", sample["target_uri"])
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
