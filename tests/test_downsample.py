"""LTTB visual downsampling (plot/downsample.py)."""

from __future__ import annotations

import numpy as np

from amazon_lookout_for_equipment_python_sdk_spark.plot.downsample import (
    downsample_series,
    lttb,
)


def test_lttb_keeps_endpoints_shape_and_spikes():
    n = 10_000
    ts = np.arange(n, dtype=np.int64)
    rng = np.random.default_rng(2)
    vals = np.sin(ts / 300.0) * 10 + rng.normal(0, 0.1, n)
    vals[4321] = 80.0  # a spike a naive stride would miss
    idx = lttb(ts, vals, 500)
    assert len(idx) == 500
    assert idx[0] == 0 and idx[-1] == n - 1
    assert (np.diff(idx) > 0).all()
    assert 4321 in set(idx.tolist())  # the spike survives
    # short series pass through
    assert lttb(ts[:100], vals[:100], 500).tolist() == list(range(100))


def test_downsample_series_spark(spark, sf_dir):
    from pyspark.sql import functions as F

    from amazon_lookout_for_equipment_python_sdk_spark.plans.registry import load

    events = load(spark, sf_dir, "events").filter("value IS NOT NULL")
    out = downsample_series(events, n_out=200)
    per = {
        r["event_type"]: r["n"]
        for r in out.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    full = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(
            F.count("*").alias("n")
        ).collect()
    }
    for k, n in per.items():
        assert n == min(200, full[k])
    # kept rows are a SUBSET of the original points (key, ts, value)
    joined = out.join(
        events.select("event_type", "ts", "value").distinct(),
        ["event_type", "ts", "value"],
        "left_anti",
    )
    assert joined.count() == 0


def test_lttb_edge_collisions_near_full_size():
    """n_out just under n: integer bucket edges collide — indices must
    stay strictly increasing, include endpoints, and never crash."""
    rng = np.random.default_rng(7)
    for n, n_out in ((100, 99), (100, 98), (50, 49), (10, 3), (4, 3)):
        ts = np.arange(n, dtype=np.int64)
        vals = rng.normal(size=n)
        idx = lttb(ts, vals, n_out)
        assert idx[0] == 0 and idx[-1] == n - 1
        assert (np.diff(idx) > 0).all(), (n, n_out, idx)
        assert len(idx) <= n_out


def test_carry_cols_ride_through_kernel_with_duplicate_stamps(spark):
    """r6 ADVICE: extra columns must carry THROUGH applyInPandas —
    duplicate timestamps used to make the old (key, ts) semi-join pull
    back every row at a kept stamp (budget overshoot).  With carry the
    budget holds exactly and each kept point keeps its own overlay
    value."""
    import datetime as dt

    from amazon_lookout_for_equipment_python_sdk_spark.plot.downsample import (
        downsample_series,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(5_000):
        ts = t0 + dt.timedelta(seconds=i // 2)  # EVERY stamp duplicated
        rows.append(("s", ts, float(i % 97), float(i)))
    df = spark.createDataFrame(
        rows, "tag string, ts timestamp, value double, rolling_avg double"
    )
    out = downsample_series(
        df, n_out=100, key_col="tag", carry_cols=["rolling_avg"]
    ).collect()
    assert len(out) == 100  # exact budget despite duplicate stamps
    by = {(r["ts"], r["value"]): r["rolling_avg"] for r in out}
    src = {(r[1], r[2]): r[3] for r in rows}
    for k, v in by.items():
        assert src[k] == v  # overlay is the row's own value
