"""Presentation layer (SURVEY §2.13): time-series panels with label /
prediction ribbons, train/eval split coloring, rolling averages, histogram
grids, and feature-importance bars — the Spark-native counterpart of the
reference's ``TimeSeriesVisualization`` (plot.py:22-676) and the evaluation
plot helpers (evaluation.py:315-555, plot.py:747-935).

Architecture: every figure's underlying frame is computed IN SPARK with the
§2 operators (resample A1, rolling A10, range expansion N5, sum-importance
A8); ``toPandas()`` happens only on the final, already-aggregated series at
the edge — bounded by plotted points, never raw data size.  Rendering goes
through the dependency-free SVG backend in ``render.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.datetime_utils import iso8601_duration_to_seconds
from ..operators.timeseries import resample_mean, rolling_mean
from . import render
from .render import (
    COLOR_LABELS,
    COLOR_PREDICTIONS,
    PALETTE,
    Band,
    Panel,
    Series,
)


def _epoch(ts) -> float:
    """Naive timestamps are ALWAYS interpreted as UTC.  pandas Timestamps
    already do that, but python datetimes (Spark .collect() rows, user
    split values) treat naive as local time — mixing the two shifts
    ribbons against series by the driver's UTC offset on non-UTC hosts."""
    from datetime import datetime, timezone

    if isinstance(ts, str):
        ts = datetime.fromisoformat(ts)
    if hasattr(ts, "timestamp"):
        if getattr(ts, "tzinfo", None) is None:
            ts = ts.replace(tzinfo=timezone.utc)
        return ts.timestamp()
    return float(ts)


@dataclass
class _RangeSet:
    df: DataFrame  # (start, end)
    title: str
    color: str


class TimeSeriesVisualization:
    """Spark-backed port of the reference visualizer (plot.py:22-101).

    ``data_format`` is ``'timeseries'`` (long: ts/tag/value) or
    ``'tabular'`` (wide: ts + one column per tag) — the same two layouts
    the reference accepts (plot.py:46-50).  ``resample`` takes an ISO-8601
    duration (``'PT5M'``) and resamples Spark-side before plotting
    (reference resamples in pandas, plot.py:249-250).
    """

    def __init__(
        self,
        timeseries_df: DataFrame,
        data_format: str,
        timestamp_col: str = "ts",
        tag_col: str | None = "tag",
        value_col: str = "value",
        resample: str | None = None,
    ):
        if data_format not in ("timeseries", "tabular"):
            # parity: plot.py:97-98
            raise ValueError(
                "`data_format` can only either be timeseries or tabular"
            )
        if data_format == "timeseries" and tag_col is None:
            # parity: plot.py:100-101
            raise ValueError(
                "`tag_col` must be defined when data format is timeseries"
            )
        self._data = timeseries_df
        self._format = data_format
        self._timestamp_col = timestamp_col
        self._tag_col = tag_col
        self._value_col = value_col
        self.resample = resample
        self._signals: list[str] = []
        self._labels: _RangeSet | None = None
        self._predictions: list[_RangeSet] = []
        self._split_ts = None
        self._rolling_window: int | None = None

    # -- signal management (plot.py:103-156) ---------------------------------

    @property
    def tags_list(self) -> list[str]:
        """Available signal names (plot.py:103-120)."""
        if self._format == "timeseries":
            return sorted(
                r[0]
                for r in self._data.select(self._tag_col).distinct().collect()
            )
        return [c for c in self._data.columns if c != self._timestamp_col]

    def add_signal(self, signals_list: list[str]) -> None:
        """Queue signals to plot; unknown names raise listing the culprits
        (plot.py:136-143)."""
        known = set(self.tags_list)
        unknown = [s for s in signals_list if s not in known]
        if unknown:
            raise ValueError(f"signals not found in the dataset: {unknown}")
        self._signals.extend(s for s in signals_list if s not in self._signals)

    # -- overlays (plot.py:258-374) ------------------------------------------

    def add_labels(
        self, labels_df: DataFrame, labels_title: str = "Known anomalies"
    ) -> None:
        """(start, end) known-anomaly ranges -> green ribbon row
        (plot.py:258-274)."""
        self._labels = _RangeSet(labels_df, labels_title, COLOR_LABELS)

    def add_predictions(
        self,
        predictions: DataFrame | list[DataFrame],
        prediction_titles: list[str] | None = None,
    ) -> None:
        """One red ribbon row per predicted-ranges table (plot.py:276-299)."""
        dfs = predictions if isinstance(predictions, list) else [predictions]
        titles = prediction_titles or [
            f"Detected events #{i + 1}" if len(dfs) > 1 else "Detected events"
            for i in range(len(dfs))
        ]
        for df, title in zip(dfs, titles):
            self._predictions.append(_RangeSet(df, title, COLOR_PREDICTIONS))

    def add_train_test_split(self, split_timestamp) -> None:
        """Color the series differently before/after the split
        (plot.py:338-360, 469-491)."""
        self._split_ts = split_timestamp

    def add_rolling_average(self, window_size: int) -> None:
        """Overlay an n-point rolling mean per signal (plot.py:362-374,
        533-535)."""
        self._rolling_window = window_size

    # -- Spark-side series extraction (plot.py:158-230) ----------------------

    def _long_view(self) -> DataFrame:
        ts, tag, val = self._timestamp_col, self._tag_col, self._value_col
        if self._format == "timeseries":
            return self._data.select(
                F.col(ts).alias("ts"),
                F.col(tag).alias("tag"),
                F.col(val).alias("value"),
            )
        tags = self._signals or self.tags_list
        pairs = ", ".join(f"'{t}', `{t}`" for t in tags)
        return self._data.select(
            F.col(ts).alias("ts"),
            F.expr(f"stack({len(tags)}, {pairs}) AS (tag, value)"),
        )

    #: per-signal point budget before LTTB visual downsampling kicks in
    #: (a 900px-wide panel cannot express more anyway)
    max_plot_points = 4_000

    def signal_series(self, tag_name: str):
        """One signal's plotted series as a small pandas frame
        (ts, value [, rolling_avg]), resampled/rolled Spark-side.

        Series beyond ``max_plot_points`` LTTB-downsample EXECUTOR-side
        before the collect (plot/downsample.py — shape-preserving:
        peaks/troughs survive where striding drops them), so plotting a
        year of 1 Hz data ships thousands of points to the driver, not
        tens of millions.  The rolling overlay attaches before the
        downsample so its kept points are exact computed values."""
        df = self._long_view().filter(F.col("tag") == tag_name)
        if self.resample:
            secs = iso8601_duration_to_seconds(self.resample)
            df = resample_mean(df, secs).select(
                "tag",
                F.col("bucket_ts").alias("ts"),
                F.col("avg_value").alias("value"),
            )
        if self._rolling_window:
            df = rolling_mean(
                df, self._rolling_window, "value", ts_col="ts", key_col="tag"
            )
        if df.count() > self.max_plot_points:
            from .downsample import downsample_series

            # extra columns (rolling_avg) carry THROUGH the kernel — the
            # old semi-join back on (tag, ts) overshot the budget on
            # duplicate stamps and depended on ts surviving the
            # unix_micros round-trip (r6 ADVICE)
            extra = [
                c for c in df.columns if c not in ("tag", "ts", "value")
            ]
            df = downsample_series(
                df,
                n_out=self.max_plot_points,
                key_col="tag",
                carry_cols=extra,
            )
        return df.orderBy("ts").drop("tag").toPandas()

    # -- figure assembly (plot.py:376-518) -----------------------------------

    def prepare(self) -> dict:
        """All figure data, computed Spark-side: per-signal series frames +
        collected (start, end) ribbon ranges.  Exposed separately from
        ``plot`` so tests (and users) can assert the underlying frames."""
        signals = self._signals or self.tags_list[:1]
        series = {t: self.signal_series(t) for t in signals}
        ranges = {}
        if self._labels is not None:
            ranges[self._labels.title] = self._labels.df.select(
                "start", "end"
            ).collect()
        for p in self._predictions:
            ranges[p.title] = p.df.select("start", "end").collect()
        return {"series": series, "ranges": ranges, "split": self._split_ts}

    def plot(self, path: str, fig_width: int = 900) -> dict:
        """Render the stacked figure: one panel per signal (split coloring +
        rolling overlay), then one short ribbon panel per label/prediction
        set (the reference's height_ratios gridspec, plot.py:376-454).
        Returns the prepared data dict."""
        data = self.prepare()
        panels: list[Panel] = []
        for i, (tag_name, pdf) in enumerate(data["series"].items()):
            xs = [_epoch(t) for t in pdf["ts"]]
            ys = [v if v is not None else float("nan") for v in pdf["value"]]
            color = PALETTE[i % len(PALETTE)]
            p = Panel(title=tag_name, height_ratio=1.0)
            if data["split"] is not None:
                split_x = _epoch(data["split"])
                p.series.append(
                    Series(
                        "Training",
                        [x for x in xs if x < split_x],
                        [y for x, y in zip(xs, ys) if x < split_x],
                        color,
                    )
                )
                p.series.append(
                    Series(
                        "Evaluation",
                        [x for x in xs if x >= split_x],
                        [y for x, y in zip(xs, ys) if x >= split_x],
                        PALETTE[(i + 1) % len(PALETTE)],
                    )
                )
            else:
                p.series.append(Series(tag_name, xs, ys, color))
            if self._rolling_window and "rolling_avg" in pdf.columns:
                p.series.append(
                    Series(
                        f"Rolling avg ({self._rolling_window})",
                        xs,
                        [
                            v if v is not None else float("nan")
                            for v in pdf["rolling_avg"]
                        ],
                        "#333333",
                    )
                )
            panels.append(p)
        for title, rows in data["ranges"].items():
            color = (
                COLOR_LABELS
                if self._labels is not None and title == self._labels.title
                else COLOR_PREDICTIONS
            )
            panels.append(
                Panel(
                    title=title,
                    height_ratio=0.25,
                    bands=[
                        Band(_epoch(r["start"]), _epoch(r["end"]), color, title)
                        for r in rows
                    ],
                )
            )
        render.render_figure(path, panels, width_px=fig_width)
        return data


# --- histogram grid (evaluation.py:394-478, plot.py:552-617) -----------------


def plot_histogram_grid(
    hists: DataFrame,
    path: str,
    key_col: str = "tag",
    subset_colors: dict[str, str] | None = None,
    ncols: int = 3,
    max_plots: int = 12,
    ranking: list[str] | None = None,
) -> dict:
    """Grid of per-signal density histograms, subsets overlaid — the
    reference's plot_histograms (evaluation.py:394-478: top-ranked signals,
    nb_cols columns, training vs anomalous distributions alpha-blended).

    ``hists``: output of ``wasserstein.density_histograms`` with columns
    (key, subset, bin, density) — plus optional bin_start/bin_width; when
    absent, bins render on their index (shape-identical, since all subsets
    share edges).  ``ranking`` orders/limits the signals (reference plots
    the top-ranked list first, evaluation.py:409-413).
    """
    pdf = hists.toPandas()
    signals = ranking or sorted(pdf[key_col].unique())
    signals = signals[:max_plots]
    subsets = sorted(pdf["subset"].unique())
    colors = subset_colors or {
        s: PALETTE[i % len(PALETTE)] for i, s in enumerate(subsets)
    }
    has_edges = "bin_start" in pdf.columns
    cells = []
    for sig in signals:
        sp = pdf[pdf[key_col] == sig]
        hh = []
        for sub in subsets:
            ss = sp[sp["subset"] == sub].sort_values("bin")
            if not len(ss):
                continue
            if has_edges:
                starts = list(ss["bin_start"])
                if "bin_width" in pdf.columns:
                    width = float(ss["bin_width"].iloc[0])
                else:
                    width = (
                        float(starts[1] - starts[0]) if len(starts) > 1 else 1.0
                    )
            else:
                starts = list(ss["bin"].astype(float))
                width = 1.0
            hh.append((sub, starts, width, list(ss["density"]), colors[sub]))
        cells.append((str(sig), hh))
    render.render_histogram_grid(path, cells, ncols=ncols)
    return {"signals": signals, "subsets": subsets, "n_cells": len(cells)}


def plot_histogram_comparison(
    timeseries_1: DataFrame,
    timeseries_2: DataFrame,
    path: str,
    label_1: str = "first",
    label_2: str = "second",
    num_bins: int = 20,
    value_col: str = "value",
) -> dict:
    """Two-distribution overlay over SHARED edges (reference
    plot_histogram_comparison, plot.py:795-856): tag each input, union,
    shared-edge density histograms, one overlaid cell."""
    from ..operators.wasserstein import density_histograms

    tagged = timeseries_1.select(
        F.lit("_cmp").alias("tag"),
        F.col(value_col).alias("value"),
        F.lit(label_1).alias("subset"),
    ).unionByName(
        timeseries_2.select(
            F.lit("_cmp").alias("tag"),
            F.col(value_col).alias("value"),
            F.lit(label_2).alias("subset"),
        )
    )
    hists = density_histograms(tagged, "subset", num_bins, with_edges=True)
    return plot_histogram_grid(
        hists, path, key_col="tag", ncols=1, max_plots=1
    )


# --- feature-importance bars (plot.py:858-907) -------------------------------


def feature_importance_frame(
    results: DataFrame, num_signals: int = 10
) -> DataFrame:
    """A8 — total diagnostic contribution per sensor over the event window:
    explode diagnostics, sum value per name, top-n desc (the reference's
    ``expanded_results.sum().sort_values().head()``, plot.py:592-594)."""
    return (
        results.select(F.explode("diagnostics").alias("d"))
        .groupBy(F.col("d.name").alias("name"))
        .agg(F.sum("d.value").alias("importance"))
        .orderBy(F.desc("importance"), "name")
        .limit(num_signals)
    )


def plot_feature_importance(
    results: DataFrame,
    path: str,
    num_signals: int = 10,
    title: str = "Feature importance",
) -> dict:
    """Horizontal bar chart of top sensor contributions with the dashed
    reference line at 1/num_features (plot.py:858-907; ref line 902-903:
    'threshold' = uniform contribution).  ``results``: scored frame with a
    ``diagnostics array<struct<name,value>>`` column."""
    totals = results.select(F.explode("diagnostics").alias("d")).agg(
        F.countDistinct("d.name").alias("n_features"),
        F.sum("d.value").alias("grand_total"),
    ).collect()[0]
    n_features = totals["n_features"]
    top = feature_importance_frame(results, num_signals).collect()
    labels = [r["name"] for r in top]
    values = [r["importance"] for r in top]
    # shares normalize by the TOTAL contribution over ALL features, not
    # just the plotted top-N — otherwise bars inflate past the 1/n
    # reference line whenever features outnumber num_signals
    total = totals["grand_total"] or 1.0
    shares = [v / total for v in values]
    ref = 1.0 / n_features if n_features else None
    render.render_barh(path, labels, shares, ref_line=ref, title=title)
    return {
        "labels": labels,
        "importance": values,
        "share": shares,
        "ref_line": ref,
    }
