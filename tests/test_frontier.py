"""Frontier batch assignment (operators/frontier.py): per-host cap,
dense batches, determinism, equivalence with the plain-window form."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.operators import (
    frontier as FR,
)


@pytest.fixture(scope="module")
def urls_df(spark):
    rows = []
    for h, n in [("a.com", 13), ("b.com", 1), ("c.com", 7)]:
        rows += [f"https://{h}/p/{i}" for i in range(n)]
    rows.append("not a parseable url")
    return spark.createDataFrame(pd.DataFrame({"url": rows}))


def test_per_host_cap_and_dense_batches(spark, urls_df):
    for k in (1, 3):
        out = FR.frontier_batches(
            urls_df, per_host_per_batch=k
        ).withColumn(
            "host", F.lower(F.try_parse_url("url", F.lit("HOST")))
        )
        sizes = {
            (r["host"], r["fetch_batch"]): r["n"]
            for r in out.groupBy("host", "fetch_batch")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert all(n <= k for n in sizes.values())
        # batches are dense 0..ceil(n/k)-1 per host, all but last full
        for host, total in [("a.com", 13), ("b.com", 1), ("c.com", 7)]:
            batches = sorted(
                b for (h, b), _ in sizes.items() if h == host
            )
            want = -(-total // k)
            assert batches == list(range(want)), (host, k, batches)
            assert all(
                sizes[(host, b)] == k for b in batches[:-1]
            ), (host, k)


def test_matches_plain_window_form(spark, urls_df):
    """The decomposed rank must equal the single-window row_number on
    the same (host, hash) axis — the chunked-twin equality contract."""
    k = 4
    out = FR.frontier_batches(urls_df, per_host_per_batch=k)
    host = F.lower(F.try_parse_url("url", F.lit("HOST")))
    axis = F.xxhash64(F.col("url").cast("string"))
    w = Window.partitionBy(host).orderBy(axis)
    plain = urls_df.withColumn(
        "want", F.floor((F.row_number().over(w) - 1) / k).cast("long")
    )
    got = {r["url"]: r["fetch_batch"] for r in out.collect()}
    want = {r["url"]: r["want"] for r in plain.collect()}
    assert got == want


def test_deterministic_across_input_order(spark, urls_df):
    a = {
        r["url"]: r["fetch_batch"]
        for r in FR.frontier_batches(urls_df).collect()
    }
    b = {
        r["url"]: r["fetch_batch"]
        for r in FR.frontier_batches(
            urls_df.orderBy(F.col("url").desc()).repartition(7)
        ).collect()
    }
    assert a == b


def test_mega_host_spans_buckets(spark):
    """A single host big enough to hit many hash buckets still ranks
    exactly (the decomposition's whole point)."""
    df = spark.range(5000).select(
        F.concat(
            F.lit("https://mega.example/p/"), F.col("id").cast("string")
        ).alias("url")
    )
    out = FR.frontier_batches(df, per_host_per_batch=10)
    sizes = [
        r["n"]
        for r in out.groupBy("fetch_batch")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(sizes) == 500 and all(n == 10 for n in sizes)
    # the 64-way value split really was exercised
    n_buckets = df.select(
        F.shiftright(
            F.xxhash64(F.col("url").cast("string")), FR._BUCKET_SHIFT
        ).alias("b")
    ).distinct().count()
    assert n_buckets > 30


def test_per_host_k_overrides_global(spark, urls_df):
    """A (host, k) rate table — e.g. robots_delays mapped through
    k = floor(period / delay) — overrides the global cap per host:
    different rates produce different batch densities, absent hosts
    fall back to the global cap, k < 1 clamps to 1 (r13 verdict #5)."""
    rates = spark.createDataFrame(
        pd.DataFrame({"host": ["a.com", "c.com"], "k": [4, 0]})
    )
    out = (
        FR.frontier_batches(
            urls_df, per_host_per_batch=2, per_host_k=rates
        )
        .withColumn(
            "host", F.lower(F.try_parse_url("url", F.lit("HOST")))
        )
        .collect()
    )
    per_host: dict = {}
    for r in out:
        per_host.setdefault(r["host"], []).append(r["fetch_batch"])
    # a.com: 13 urls at k=4 -> 4 batches, dense, cap respected
    a = sorted(per_host["a.com"])
    assert max(a) == 3 and set(a) == {0, 1, 2, 3}
    assert max(a.count(b) for b in set(a)) <= 4
    # c.com: k=0 clamps to 1 -> 7 singleton batches
    assert sorted(per_host["c.com"]) == list(range(7))
    # b.com absent from the table -> global k=2 -> single batch
    assert per_host["b.com"] == [0]
    # uniform table == global scalar, row for row
    uniform = spark.createDataFrame(
        pd.DataFrame({"host": ["a.com", "b.com", "c.com"], "k": [2, 2, 2]})
    )
    lhs = FR.frontier_batches(
        urls_df, per_host_per_batch=2, per_host_k=uniform
    )
    rhs = FR.frontier_batches(urls_df, per_host_per_batch=2)
    assert sorted(map(tuple, lhs.collect())) == sorted(
        map(tuple, rhs.collect())
    )
    # output schema unchanged: staging (incl. _fb_k) dropped
    assert lhs.columns == ["url", "fetch_batch"]


def test_per_host_k_rate_table_hygiene(spark, urls_df):
    """r14 review fixes: duplicate hosts in the rate table must not
    multiply frontier rows (smallest k wins), a NULL k falls back to
    the GLOBAL cap (not max-throttle 1), and rates match an explicit
    mixed-case host_col via case-folded join."""
    n_in = urls_df.count()
    dup = spark.createDataFrame(
        pd.DataFrame({"host": ["a.com", "a.com", "c.com"],
                      "k": [4, 13, None]})
    )
    out = FR.frontier_batches(
        urls_df, per_host_per_batch=3, per_host_k=dup
    )
    assert out.count() == n_in  # no row multiplication
    got = (
        out.withColumn(
            "host", F.lower(F.try_parse_url("url", F.lit("HOST")))
        )
        .groupBy("host")
        .agg(F.max("fetch_batch").alias("mb"))
        .collect()
    )
    mb = {r["host"]: r["mb"] for r in got}
    assert mb["a.com"] == 3  # 13 a.com urls at min(4,13)=4 -> 4 batches
    assert mb["c.com"] == 2  # NULL k -> global 3 -> ceil(7/3)=3 batches
    # mixed-case explicit host_col still matches its lowercased rate
    mixed = spark.createDataFrame(
        pd.DataFrame({"h": ["X.COM"] * 6, "url": [f"u{i}" for i in range(6)]})
    )
    rates = spark.createDataFrame(pd.DataFrame({"host": ["x.com"], "k": [2]}))
    out2 = FR.frontier_batches(
        mixed, url_col="url", host_col="h",
        per_host_per_batch=6, per_host_k=rates,
    )
    assert out2.agg(F.max("fetch_batch")).first()[0] == 2  # k=2 applied


def test_per_host_k_mixed_null_and_concrete_takes_smaller(spark, urls_df):
    """r15 ADVICE: a host carrying BOTH a concrete k row and a NULL k
    row must resolve to min(concrete, global) — the documented
    'conservative, smallest wins' merge — not let the concrete k win
    when the global cap is smaller."""
    mixed = spark.createDataFrame(
        pd.DataFrame({"host": ["a.com", "a.com"], "k": [5, None]})
    )
    out = FR.frontier_batches(
        urls_df, per_host_per_batch=2, per_host_k=mixed
    )
    got = (
        out.withColumn(
            "host", F.lower(F.try_parse_url("url", F.lit("HOST")))
        )
        .filter(F.col("host") == "a.com")
        .agg(F.max("fetch_batch"))
        .first()[0]
    )
    # 13 a.com urls at min(5, global 2) = 2 per batch -> batches 0..6
    assert got == 6


def test_guards(spark, urls_df):
    with pytest.raises(ValueError, match="fetch_batch"):
        FR.frontier_batches(
            urls_df.withColumn("fetch_batch", F.lit(0))
        )
    with pytest.raises(ValueError, match=">= 1"):
        FR.frontier_batches(urls_df, per_host_per_batch=0)
    with pytest.raises(ValueError, match="_b"):
        FR.frontier_batches(
            urls_df.withColumnRenamed("url", "_b"), url_col="_b"
        )


def test_staging_clash_guard_full_frame(spark, urls_df):
    with pytest.raises(ValueError, match="_off"):
        FR.frontier_batches(urls_df.withColumn("_off", F.lit(1)))
    # passenger columns that DON'T clash ride through untouched
    out = FR.frontier_batches(
        urls_df.withColumn("note", F.lit("x"))
    )
    assert out.columns == ["url", "note", "fetch_batch"]
    # chunked-twin reserved names frontier never stages (_m, _c, _n,
    # _d...) are legal passengers — the full-frame guard_internal was
    # the spurious-rejection class r13 ADVICE flagged
    out2 = FR.frontier_batches(
        urls_df.withColumn("_m", F.lit(1)).withColumn("_c", F.lit(2))
    )
    assert out2.columns == ["url", "_m", "_c", "fetch_batch"]
    # join_boundary's staging prefix is still guarded
    with pytest.raises(ValueError, match="_nsj_"):
        FR.frontier_batches(urls_df.withColumn("_nsj_x", F.lit(1)))
