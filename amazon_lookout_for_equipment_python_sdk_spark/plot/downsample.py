"""LTTB downsampling (Steinarsson 2013, "Downsampling Time Series for
Visual Representation") — the plot layer's scale bridge.

The reference plots series with pandas/matplotlib after collecting them
(plot.py operates in-RAM); at 100 TB a dashboard cannot ship a billion
points to a browser.  Largest-Triangle-Three-Buckets keeps the ~2-4k
points that preserve the series' visual shape (peaks, troughs, trend
reversals) far better than striding or bucket means: each bucket keeps
the point forming the largest triangle with the previously kept point
and the next bucket's centroid.

Engine shape: per-series sequential (each choice depends on the
previous kept point), so one ``applyInPandas`` group per series — the
same per-series regime as the Gorilla codec; series downsample in
parallel, only the downsampled points reach the driver/plot.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def lttb(ts: "np.ndarray", vals: "np.ndarray", n_out: int) -> "np.ndarray":
    """Indices of the <= n_out points LTTB keeps (always includes both
    endpoints; series shorter than n_out pass through untouched)."""
    n = len(ts)
    if n_out >= n or n_out < 3:
        return np.arange(n)
    ts = ts.astype(np.float64)
    vals = vals.astype(np.float64)
    # n_out-2 interior buckets over points 1..n-2
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    keep = [0]
    prev = 0
    for b in range(n_out - 2):
        lo, hi = edges[b], edges[b + 1]
        if hi <= lo:  # integer-truncated edges can collide near n_out ~ n
            hi = lo + 1
        nlo, nhi = edges[b + 1], (edges[b + 2] if b + 2 < len(edges) else n)
        if nhi <= nlo:
            nlo, nhi = nlo, nlo + 1
        cx = ts[nlo:nhi].mean() if nhi > nlo else ts[-1]
        cy = vals[nlo:nhi].mean() if nhi > nlo else vals[-1]
        ax, ay = ts[prev], vals[prev]
        # triangle area (up to x2): |(ax-cx)(vy-ay) - (ax-vx)(cy-ay)|
        vx = ts[lo:hi]
        vy = vals[lo:hi]
        area = np.abs((ax - cx) * (vy - ay) - (ax - vx) * (cy - ay))
        prev = lo + int(np.argmax(area))
        keep.append(prev)
    keep.append(n - 1)
    return np.asarray(keep, dtype=np.int64)


def downsample_series(
    df,
    n_out: int = 2_000,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    carry_cols=None,
):
    """DataFrame -> per-series LTTB downsample: (key, ts, value
    [, carry...]) with <= n_out rows per series.  One shuffle on the
    key; each series downsamples row-local in its group,
    deterministically ((ts, value) sort; argmax first-match tie-break).

    ``carry_cols`` ride along through the kernel: extra columns (e.g. a
    rolling overlay) keep their row's value on every kept point.  This
    replaces the old join-back-on-(key, ts) consumers used to do, which
    (a) pulled back EVERY row at a kept timestamp when a series has
    duplicate stamps — budget overshoot — and (b) silently dropped
    points whenever ts did not survive the unix_micros round-trip
    (r6 ADVICE)."""
    from pyspark.sql import functions as F

    carry = [c for c in (carry_cols or [])]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_us", value_col]).reset_index(drop=True)
        idx = lttb(
            pdf["_us"].to_numpy(), pdf[value_col].to_numpy(), n_out
        )
        return pdf.iloc[idx][[key_col, "_us", value_col] + carry]

    prepared = df.select(
        key_col,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        value_col,
        *carry,
    )
    carry_schema = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in carry
    )
    out = prepared.groupBy(key_col).applyInPandas(
        run,
        schema=(
            f"{key_col} string, _us long, {value_col} double{carry_schema}"
        ),
    )
    return out.select(
        key_col,
        F.timestamp_micros(F.col("_us")).alias(ts_col),
        value_col,
        *carry,
    )
