"""Statistical-monitoring operators (operators/stats.py) vs independent
pure-python/numpy references on synthetic series with known structure."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.operators import stats as st


def _series_df(spark, values, key="a"):
    rows = [
        (key, i, float(v), f"2024-01-01 {i // 3600:02d}:{(i // 60) % 60:02d}:{i % 60:02d}")
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "event_type string, event_id long, value double, ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")


def test_rolling_zscore_matches_pandas(spark):
    rng = np.random.RandomState(7)
    vals = np.round(rng.normal(50, 5, 300), 2)
    vals[250] = 200.0  # an unmistakable outlier
    df = _series_df(spark, vals)
    out = (
        st.rolling_zscore(df, 30)
        .orderBy("event_id")
        .select("event_id", "zscore")
        .collect()
    )
    # reference: trailing-30 inclusive window, sample std
    import pandas as pd

    s = pd.Series(vals)
    roll = s.rolling(30)
    ref = (s - roll.mean()) / roll.std(ddof=1)
    for r in out:
        i = r["event_id"]
        if i < 29:
            assert r["zscore"] is None
        else:
            assert r["zscore"] == pytest.approx(ref[i], rel=1e-9, abs=1e-9)
    z250 = [r["zscore"] for r in out if r["event_id"] == 250][0]
    assert z250 > 5


def test_rolling_zscore_constant_window_is_null(spark):
    df = _series_df(spark, [5.0] * 40)
    out = st.rolling_zscore(df, 10).select("zscore").collect()
    assert all(r["zscore"] is None for r in out)


def test_rolling_zscore_cumsum_diff_equals_frame_aggregates(spark):
    """r16 rewrite pin: the running-cumsum + lag(W) trailing aggregates
    must be BIT-identical to literal sliding-frame aggregates on an
    adversarial fixture — multiple keys, ~20% null values (count/sum
    null semantics), ts ties broken by event_id, and windows both short
    and saturated.  Exact-integer arithmetic makes equality exact, so
    compare raw float bits, not approx."""
    import struct

    rng = np.random.RandomState(11)
    rows = []
    for k in ("a", "b", "c"):
        for i in range(120):
            v = round(float(rng.normal(40, 8)), 2)
            if rng.rand() < 0.2:
                v = None
            # ts ties every 3rd row exercise the tiebreak ordering
            rows.append((k, i, v, f"2021-01-01 00:{(i // 3):02d}:00"))
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, value double, ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    W = 25
    got = {
        r["event_id"] * 10 + ord(r["event_type"][0]): r["zscore"]
        for r in st.rolling_zscore(df, W).collect()
    }
    # reference: the pre-r16 literal sliding-frame shape
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(W - 1), 0)
    )
    x = F.round(F.col("value") * 100).cast("long")
    ref_df = (
        df.withColumn("_n", F.count(x).over(w))
        .withColumn("_s", F.sum(x).over(w))
        .withColumn("_q", F.sum(x * x).over(w))
    )
    n, s, q = F.col("_n"), F.col("_s"), F.col("_q")
    var_num = n * q - s * s
    z = (x * n - s).cast("double") / F.sqrt(
        var_num.cast("double") * n.cast("double")
        / (n - F.lit(1)).cast("double")
    )
    ref_rows = ref_df.withColumn(
        "zscore", F.when((n >= F.lit(W)) & (var_num > F.lit(0)), z)
    ).collect()
    ref = {
        r["event_id"] * 10 + ord(r["event_type"][0]): r["zscore"]
        for r in ref_rows
    }
    assert set(got) == set(ref)

    def bits(v):
        return None if v is None else struct.pack("<d", v)

    assert {k: bits(v) for k, v in got.items()} == {
        k: bits(v) for k, v in ref.items()
    }


def test_cusum_reflected_equals_direct_recursion(spark):
    rng = np.random.RandomState(3)
    vals = np.round(rng.normal(20, 2, 200), 2)
    vals[120:] += 6  # injected mean shift -> CUSUM must climb after 120
    df = _series_df(spark, vals)
    out = (
        st.cusum_reflected(df)
        .orderBy("event_id")
        .select("event_id", "cusum")
        .collect()
    )
    # direct recursion reference against the lower median target
    cents = np.round(vals * 100).astype(np.int64)
    med = int(np.sort(cents)[(len(cents) + 1) // 2 - 1])
    s, ref = 0, []
    for xc in cents:
        s = max(0, s + int(xc) - med)
        ref.append(s / 100.0)
    got = [r["cusum"] for r in out]
    assert got == pytest.approx(ref, abs=1e-9)
    assert ref[-1] > ref[119]  # drift detected


def test_cusum_median_tiebreak_deterministic(spark):
    # even-length constant-ish series: lower median must be used
    df = _series_df(spark, [1.0, 2.0, 3.0, 4.0])
    out = st.cusum_reflected(df).orderBy("event_id").collect()
    # med = lower median = 2.0 -> d = [-1,0,1,2] cumsum [-1,-1,0,2]
    # reflected: [0,0,1,3]
    assert [r["cusum"] for r in out] == pytest.approx([0.0, 0.0, 1.0, 3.0])


def _resampled_two_signals(spark, xs, ys):
    rows = []
    for i, (x, y) in enumerate(zip(xs, ys)):
        rows.append(("sa", i, float(x)))
        rows.append(("sb", i, float(y)))
    df = spark.createDataFrame(
        rows, "event_type string, bucket long, avg_value double"
    )
    return df.withColumn(
        "bucket_ts", F.timestamp_seconds(F.col("bucket") * 300)
    ).drop("bucket")


def _spearman_ref(xs, ys):
    # tie-free rank correlation == Pearson on ranks
    rx = np.argsort(np.argsort(xs)) + 1.0
    ry = np.argsort(np.argsort(ys)) + 1.0
    return float(np.corrcoef(rx, ry)[0, 1])


def test_spearman_pairs_matches_rank_pearson(spark):
    rng = np.random.RandomState(11)
    xs = rng.permutation(100).astype(float)  # tie-free
    ys = xs * 0.7 + rng.normal(0, 20, 100)
    df = _resampled_two_signals(spark, xs, ys)
    out = st.spearman_pairs(df, key_col="event_type").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["sig_a"], r["sig_b"], r["n_buckets"]) == ("sa", "sb", 100)
    assert r["rho"] == pytest.approx(_spearman_ref(xs, ys), abs=1e-9)


def test_spearman_perfect_monotone(spark):
    xs = np.arange(50, dtype=float)
    df = _resampled_two_signals(spark, xs, np.exp(xs / 10))
    r = st.spearman_pairs(df, key_col="event_type").collect()[0]
    assert r["rho"] == pytest.approx(1.0)
    r2 = st.spearman_pairs(
        _resampled_two_signals(spark, xs, -xs), key_col="event_type"
    ).collect()[0]
    assert r2["rho"] == pytest.approx(-1.0)


def test_autocorr_lag_matches_numpy(spark):
    rng = np.random.RandomState(5)
    # AR(1)-ish integer series
    x = [1000]
    for _ in range(299):
        x.append(int(0.8 * x[-1] + rng.randint(-50, 50)))
    rows = [("a", i, int(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(
        rows, "event_type string, bucket long, sum_cents long"
    ).withColumn(
        "bucket_ts", F.timestamp_seconds(F.col("bucket") * 300)
    ).drop("bucket")
    for lag in (1, 3):
        out = st.autocorr_lag(df, lag).collect()[0]
        a, b = np.array(x[:-lag], float), np.array(x[lag:], float)
        assert out["n_pairs"] == len(a)
        assert out["acf"] == pytest.approx(
            float(np.corrcoef(a, b)[0, 1]), abs=1e-9
        )


def test_rolling_zscore_chunked_equals_plain(spark):
    """Exactness of the skew-safe shard path, including sparse buckets
    (gaps force context replication to chain across several buckets)."""
    rng = np.random.RandomState(13)
    rows = []
    for key in ("a", "b"):
        t = 0
        for i in range(400):
            t += int(rng.randint(1, 2500))  # gaps up to ~40 min
            rows.append((key, t, i, round(float(rng.normal(50, 5)), 2)))
    df = (
        spark.createDataFrame(
            rows, "event_type string, tsec long, event_id long, value double"
        )
        .withColumn("ts", F.timestamp_seconds("tsec"))
        .drop("tsec")
    )
    plain = {
        (r["event_type"], r["event_id"]): r["zscore"]
        for r in st.rolling_zscore(df, 25).collect()
    }
    chunk = {
        (r["event_type"], r["event_id"]): r["zscore"]
        for r in st.rolling_zscore_chunked(
            df, 25, bucket_span_s=3600
        ).collect()
    }
    assert plain == chunk
    assert len(plain) == 800


def test_cusum_chunked_equals_plain(spark):
    """Exactness of the two-level scan decomposition (r9): the chunked
    reflected walk must reproduce the plain form row-for-row, including
    sparse buckets (empty time buckets mean carries chain across gaps),
    per-key first buckets (no carry -> NULL carried-min), negative
    drifts (the reflected min actually binds), and timestamp ties
    (tiebreak column ordering)."""
    rng = np.random.RandomState(29)
    rows = []
    for key in ("a", "b", "c"):
        t = 0
        for i in range(500):
            # occasional large gaps leave whole buckets empty
            t += int(rng.choice([1, 7, 60, 9000], p=[0.5, 0.3, 0.15, 0.05]))
            # drifting mean so the walk crosses its running min repeatedly
            rows.append(
                (key, t, i,
                 round(float(rng.normal(50 + (i // 100) * 3, 8)), 2))
            )
    # timestamp tie: two rows share (key, ts), ordered by event_id
    rows.append(("a", rows[0][1], 10_000, 99.31))
    df = (
        spark.createDataFrame(
            rows, "event_type string, tsec long, event_id long, value double"
        )
        .withColumn("ts", F.timestamp_seconds("tsec"))
        .drop("tsec")
    )
    plain = {
        (r["event_type"], r["event_id"]): r["cusum"]
        for r in st.cusum_reflected(df).collect()
    }
    chunk = {
        (r["event_type"], r["event_id"]): r["cusum"]
        for r in st.cusum_reflected_chunked(df, bucket_span_s=600).collect()
    }
    assert plain == chunk
    assert len(plain) == 1501
    # the reflected clamp must have engaged somewhere (else the test
    # couldn't distinguish S_i = C_i from the real statistic)
    assert any(v > 0 for v in plain.values())


def test_stats_single_shuffle_plans(spark):
    """Scale shapes: z-score and CUSUM must keep ONE Exchange (the per-key
    window partitioning reused by every stacked window)."""
    df = _series_df(spark, [float(i % 7) for i in range(50)])
    for out in (st.rolling_zscore(df, 10), st.cusum_reflected(df)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        n_exchange = plan.count("Exchange hashpartitioning")
        assert n_exchange == 1, plan


def test_rolling_corr_matches_pandas(spark):
    rng = np.random.RandomState(41)
    n = 120
    x = rng.randint(-500, 500, n)
    y = (x * 2 + rng.randint(-100, 100, n)).astype(int)
    rows = [(int(i), int(x[i]), int(y[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "bucket long, xc long, yc long") \
        .withColumn("bucket_ts", F.timestamp_seconds(F.col("bucket") * 300))
    out = {
        r["bucket"]: r["rolling_r"]
        for r in st.rolling_corr(df, 20, order_col="bucket_ts").collect()
    }
    import pandas as pd

    ref = pd.Series(x.astype(float)).rolling(20).corr(pd.Series(y.astype(float)))
    for i in range(n):
        if i < 19:
            assert out[i] is None
        else:
            assert out[i] == pytest.approx(ref[i], abs=1e-9)


def test_rolling_corr_constant_window_null(spark):
    rows = [(i, 5, i) for i in range(30)]
    df = spark.createDataFrame(rows, "bucket long, xc long, yc long") \
        .withColumn("bucket_ts", F.timestamp_seconds(F.col("bucket") * 300))
    out = st.rolling_corr(df, 10, order_col="bucket_ts").collect()
    assert all(r["rolling_r"] is None for r in out)  # x constant


def test_ewma_matches_pandas_ewm(spark):
    """EWMA (adjust=True, truncated Horner fold) vs pandas ewm.mean():
    equal to truncation error (1-alpha)^window ~ 1e-10."""
    rng = np.random.RandomState(47)
    vals = rng.normal(100, 10, 200)
    rows = [("a", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_type string, bucket long, avg_value double"
    ).withColumn("bucket_ts", F.timestamp_seconds(F.col("bucket") * 300))
    out = {
        r["bucket"]: r["ewma"]
        for r in st.ewma(df, alpha=0.3, window=64).collect()
    }
    import pandas as pd

    ref = pd.Series(vals).ewm(alpha=0.3, adjust=True).mean()
    for i in range(200):
        assert out[i] == pytest.approx(ref[i], rel=1e-8), i


def test_ewma_tracks_level_shift(spark):
    vals = [10.0] * 50 + [20.0] * 50
    rows = [("a", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_type string, bucket long, avg_value double"
    ).withColumn("bucket_ts", F.timestamp_seconds(F.col("bucket") * 300))
    out = {r["bucket"]: r["ewma"] for r in st.ewma(df, 0.3).collect()}
    assert out[49] == pytest.approx(10.0, abs=1e-6)
    assert out[99] == pytest.approx(20.0, abs=0.01)
    assert 10.0 < out[52] < 20.0  # transitioning


def test_ewma_null_handling(spark):
    """NULLs skip (ignore_na=True semantics); an all-null leading window
    yields NULL instead of erroring."""
    rows = [("a", 0, None), ("a", 1, None), ("a", 2, 10.0), ("a", 3, 20.0)]
    df = spark.createDataFrame(
        rows, "event_type string, bucket long, avg_value double"
    ).withColumn("bucket_ts", F.timestamp_seconds(F.col("bucket") * 300))
    out = {r["bucket"]: r["ewma"] for r in st.ewma(df, 0.5, window=8).collect()}
    assert out[0] is None and out[1] is None
    assert out[2] == pytest.approx(10.0)
    # compacted recursion over [10, 20]: (10*0.5+20)/(0.5+1)
    assert out[3] == pytest.approx((10 * 0.5 + 20) / 1.5)


def test_ewma_chunked_equals_plain(spark):
    """The skew-safe twin is BIT-equal to ewma (the fold expression is
    shared verbatim) across bucket geometries — buckets thinner than
    the 64-row window (context must chain across several buckets),
    null values inside frames, a NULL key group, one null order-ts row
    per key (nulls-first sentinel), multiple keys, and one giant
    bucket."""
    rng = np.random.RandomState(61)
    rows = []
    for k in (None, "a", "b"):
        vals = rng.normal(100, 10, 150)
        for i, v in enumerate(vals):
            # ~10% null values (ignore_na path)
            val = None if rng.rand() < 0.1 else float(v)
            rows.append((k, i, val))
    df = spark.createDataFrame(
        rows, "event_type string, bucket long, avg_value double"
    ).withColumn(
        "bucket_ts",
        F.when(
            F.col("bucket") == 77, F.lit(None).cast("timestamp")
        ).otherwise(F.timestamp_seconds(F.col("bucket") * 300)),
    )

    def key(out):
        return {
            (r["event_type"], r["bucket"]): r["ewma"] for r in out.collect()
        }

    plain = key(st.ewma(df, alpha=0.3, window=64))
    assert len(plain) == 450
    # spans: 2 buckets/window-span, ~6-row buckets (context chains
    # across 10+ buckets), and one giant bucket
    for span in (1_800, 9_600, 10_000_000):
        got = key(
            st.ewma_chunked(
                df, alpha=0.3, bucket_span_s=span, window=64
            )
        )
        assert got == plain, span  # exact — shared fold expression


def test_exact_distinct_two_phase_matches_count_distinct(spark):
    rng = np.random.RandomState(53)
    rows = [("hot" if i % 10 else f"k{i % 7}", int(rng.randint(0, 500)))
            for i in range(5000)]
    df = spark.createDataFrame(rows, "k string, item long")
    got = {
        r["k"]: r["n_distinct"]
        for r in st.exact_distinct_two_phase(df, "k", "item").collect()
    }
    want = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(
            F.count_distinct("item").alias("n")
        ).collect()
    }
    assert got == want
    # plan shape: the heavy exchange keys on (k, item), not k alone
    plan = (
        st.exact_distinct_two_phase(df, "k", "item")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(k#" in plan and "item" in plan.split(
        "hashpartitioning"
    )[1], plan
