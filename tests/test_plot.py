"""Presentation-layer tests (SURVEY §2.13): every figure renders to a file
and the underlying Spark-computed frames are asserted — the tutorial-parity
check VERDICT r1 asked for (reference plot.py:376-518, 552-617, 858-907)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.operators import (
    wasserstein as ws,
)
from amazon_lookout_for_equipment_python_sdk_spark.plot import (
    TimeSeriesVisualization,
    feature_importance_frame,
    plot_feature_importance,
    plot_histogram_grid,
)


@pytest.fixture(scope="module")
def long_ts(spark):
    rows = []
    for i in range(240):
        ts = f"2024-01-01 {i // 60:02d}:{i % 60:02d}:00"
        rows.append((ts, "s1", math.sin(i / 20.0) * 5 + 50))
        rows.append((ts, "s2", math.cos(i / 15.0) * 3 + 20))
    return spark.createDataFrame(
        rows, "ts string, tag string, value double"
    ).select(F.to_timestamp("ts").alias("ts"), "tag", "value")


def test_visualizer_validation(spark, long_ts):
    with pytest.raises(ValueError, match="timeseries or tabular"):
        TimeSeriesVisualization(long_ts, "wide")
    with pytest.raises(ValueError, match="tag_col"):
        TimeSeriesVisualization(long_ts, "timeseries", tag_col=None)
    viz = TimeSeriesVisualization(long_ts, "timeseries")
    assert viz.tags_list == ["s1", "s2"]
    with pytest.raises(ValueError, match="nope"):
        viz.add_signal(["s1", "nope"])


def test_visualizer_full_figure(spark, long_ts, tmp_path):
    """Signals + resample + rolling + split + label/prediction ribbons ->
    one SVG; prepared frames carry the Spark-side computation."""
    viz = TimeSeriesVisualization(
        long_ts, "timeseries", resample="PT5M"
    )
    viz.add_signal(["s1", "s2"])
    viz.add_rolling_average(3)
    viz.add_train_test_split("2024-01-01 02:00:00")
    labels = spark.createDataFrame(
        [("2024-01-01 00:30:00", "2024-01-01 00:45:00")],
        "start string, end string",
    ).select(
        F.to_timestamp("start").alias("start"),
        F.to_timestamp("end").alias("end"),
    )
    viz.add_labels(labels)
    viz.add_predictions(labels.select(
        (F.col("start") + F.expr("INTERVAL 1 HOUR")).alias("start"),
        (F.col("end") + F.expr("INTERVAL 1 HOUR")).alias("end"),
    ))
    out = str(tmp_path / "fig.svg")
    data = viz.plot(out)
    # resampled PT5M over 4 hours -> 48 buckets per signal
    assert len(data["series"]["s1"]) == 48
    assert "rolling_avg" in data["series"]["s1"].columns
    # first 2 rolling values are null (min_periods semantics), 3rd is mean
    s1 = data["series"]["s1"]
    assert s1["rolling_avg"].isna().sum() == 2
    exp = s1["value"][:3].mean()
    assert abs(s1["rolling_avg"][2] - exp) < 1e-9
    assert set(data["ranges"]) == {"Known anomalies", "Detected events"}
    svg = open(out).read()
    assert svg.startswith("<svg") and svg.rstrip().endswith("</svg>")
    assert "Known anomalies" in svg and "Detected events" in svg
    assert "Training" in svg and "Evaluation" in svg


def test_visualizer_tabular(spark, tmp_path):
    wide = spark.createDataFrame(
        [(f"2024-01-01 00:{i:02d}:00", float(i), float(i * 2)) for i in range(30)],
        "ts string, p1 double, p2 double",
    ).select(F.to_timestamp("ts").alias("ts"), "p1", "p2")
    viz = TimeSeriesVisualization(
        wide, "tabular", timestamp_col="ts", tag_col=None
    )
    assert viz.tags_list == ["p1", "p2"]
    viz.add_signal(["p2"])
    data = viz.plot(str(tmp_path / "tab.svg"))
    assert list(data["series"]) == ["p2"]
    assert len(data["series"]["p2"]) == 30


def test_histogram_grid(spark, events, tmp_path):
    tagged = events.withColumn(
        "subset",
        F.when(F.col("value") < 150, "train").otherwise("eval"),
    )
    hists = ws.density_histograms(
        tagged, "subset", 20, key_col="event_type", value_col="value"
    )
    out = str(tmp_path / "hists.svg")
    info = plot_histogram_grid(hists, out, key_col="event_type", ncols=2)
    assert info["n_cells"] == len(info["signals"]) > 0
    assert set(info["subsets"]) == {"train", "eval"}
    svg = open(out).read()
    assert svg.count("<rect") > 20  # grid frames + histogram bars


def test_compute_bin_edges_and_comparison(spark, tmp_path):
    import numpy as np

    from amazon_lookout_for_equipment_python_sdk_spark import (
        compute_bin_edges,
        plot_histogram_comparison,
    )

    df = spark.createDataFrame(
        [("s", float(v)) for v in range(11)], "tag string, value double"
    )
    edges = compute_bin_edges(df, num_bins=10).collect()[0]["edges"]
    np.testing.assert_allclose(edges, np.linspace(0.0, 10.0, 11), rtol=1e-12)
    a = spark.range(100).select((F.col("id") % 10).cast("double").alias("value"))
    b = spark.range(100).select((F.col("id") % 5 + 5).cast("double").alias("value"))
    out = str(tmp_path / "cmp.svg")
    info = plot_histogram_comparison(a, b, out, "train", "eval")
    assert set(info["subsets"]) == {"train", "eval"}
    assert open(out).read().startswith("<svg")


def test_feature_importance(spark, tmp_path):
    rows = [
        (1, [("machine\\s1", 0.7), ("machine\\s2", 0.2), ("machine\\s3", 0.1)]),
        (1, [("machine\\s1", 0.5), ("machine\\s2", 0.4), ("machine\\s3", 0.1)]),
    ]
    scored = spark.createDataFrame(
        rows,
        "prediction int, diagnostics array<struct<name:string,value:double>>",
    )
    top = feature_importance_frame(scored, 2).collect()
    assert [r["name"] for r in top] == ["machine\\s1", "machine\\s2"]
    assert abs(top[0]["importance"] - 1.2) < 1e-9
    out = str(tmp_path / "imp.svg")
    info = plot_feature_importance(scored, out, num_signals=3)
    # ref line at 1/num_features (plot.py:902-903)
    assert abs(info["ref_line"] - 1.0 / 3) < 1e-12
    assert abs(sum(info["share"]) - 1.0) < 1e-9
    svg = open(out).read()
    assert "machine\\s1" in svg and "stroke-dasharray" in svg
    # top-N < n_features: shares stay fractions of the GRAND total (the
    # truncated bars must not renormalize to 1 and jump the ref line)
    info2 = plot_feature_importance(scored, str(tmp_path / "imp2.svg"), num_signals=2)
    assert abs(sum(info2["share"]) - 0.9) < 1e-9  # s1+s2 = 1.8 of 2.0
    assert abs(info2["ref_line"] - 1.0 / 3) < 1e-12


def test_signal_series_downsamples_large_series(spark):
    """A series past max_plot_points must LTTB-downsample executor-side:
    bounded point count, endpoints + an injected spike kept, rolling
    overlay column intact on the kept points."""
    from pyspark.sql import functions as F

    from amazon_lookout_for_equipment_python_sdk_spark.plot.viz import (
        TimeSeriesVisualization,
    )

    n = 20_000
    base = 1_700_000_000
    df = (
        spark.range(n)
        .select(
            F.timestamp_seconds(F.lit(base) + F.col("id") * 60).alias("ts"),
            F.lit("sig").alias("tag"),
            (F.sin(F.col("id") / 500.0) * 10).alias("value"),
        )
        .withColumn(
            "value",
            F.when(F.col("ts") == F.timestamp_seconds(F.lit(base + 7777 * 60)), 99.0)
            .otherwise(F.col("value")),
        )
    )
    viz = TimeSeriesVisualization(
        df, timestamp_col="ts", tag_col="tag", value_col="value",
        data_format="timeseries",
    )
    viz.add_signal(["sig"])
    viz.add_rolling_average(10)
    pdf = viz.signal_series("sig")
    assert len(pdf) <= viz.max_plot_points
    assert "rolling_avg" in pdf.columns
    assert pdf["value"].max() == 99.0  # the spike survives downsampling
    assert pdf["ts"].iloc[0].timestamp() == base
    assert pdf["ts"].iloc[-1].timestamp() == base + (n - 1) * 60
