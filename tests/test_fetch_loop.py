"""The reference fetch loop (docs/examples/fetch_loop_demo.py) — the
demo is load-bearing documentation, so its loop contract is pinned:
batch order, per-host delays, failure rows, WARC round trip, empty
plan."""

from __future__ import annotations

import importlib.util
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

_DEMO = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "examples", "fetch_loop_demo.py",
)


@pytest.fixture(scope="module")
def demo():
    spec = importlib.util.spec_from_file_location("fetch_loop_demo", _DEMO)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_run_fetch_loop_round_trip(spark, demo, tmp_path):
    from amazon_lookout_for_equipment_python_sdk_spark.operators.frontier import (
        frontier_batches,
    )
    from amazon_lookout_for_equipment_python_sdk_spark.sources.warc import (
        read_warc,
    )

    urls = spark.createDataFrame(
        pd.DataFrame(
            {"url": [f"https://h{i % 3}.example/p/{i}" for i in range(18)]}
        )
    )
    plan = frontier_batches(urls, per_host_per_batch=2).select(
        "url",
        F.lower(F.try_parse_url("url", F.lit("HOST"))).alias("host"),
        "fetch_batch",
    )
    out = str(tmp_path / "loop")
    dirs = demo.run_fetch_loop(
        spark, plan, out, delays={"h0.example": 0.001},
        default_delay_s=0.0, batch_period_s=0.0,
    )
    assert len(dirs) == 3  # 6 urls/host at k=2 -> 3 batches
    back = read_warc(
        spark, os.path.join(out, "b*"), record_types=["response"]
    ).filter(F.col("error").isNull())
    assert back.count() == 18
    # payloads are real HTTP responses carrying the url
    row = back.orderBy("target_uri").first()
    assert bytes(row["payload"]).startswith(b"HTTP/1.1 200")


def test_run_fetch_loop_failure_rows_and_empty_plan(spark, demo, tmp_path):
    from amazon_lookout_for_equipment_python_sdk_spark.sources.warc import (
        read_warc,
    )

    # a fetcher that dies on one URL must yield a 599 row, not raise
    orig = demo.fetch_one

    def flaky(url):
        if url.endswith("/1"):
            raise OSError("connection refused")
        return orig(url)

    demo.fetch_one = flaky
    try:
        plan = spark.createDataFrame(
            pd.DataFrame(
                {
                    "url": [f"https://f.example/{i}" for i in range(3)],
                    "host": ["f.example"] * 3,
                    "fetch_batch": [0, 0, 0],
                }
            )
        )
        out = str(tmp_path / "flaky")
        demo.run_fetch_loop(
            spark, plan, out, delays={}, default_delay_s=0.0,
            batch_period_s=0.0,
        )
        back = read_warc(spark, os.path.join(out, "b*")).filter(
            F.col("record_type") == "response"
        )
        payloads = [bytes(r["payload"]) for r in back.collect()]
        assert len(payloads) == 3
        assert sum(p.startswith(b"HTTP/1.1 599") for p in payloads) == 1
    finally:
        demo.fetch_one = orig
    # empty plan: no crash, nothing written
    empty = spark.createDataFrame(
        [], "url string, host string, fetch_batch long"
    )
    assert demo.run_fetch_loop(
        spark, empty, str(tmp_path / "none"), delays={}
    ) == []
