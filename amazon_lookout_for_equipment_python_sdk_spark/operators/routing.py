"""Auto-routing between plain operators and their skew-safe twins
(r9 verdict #5).

Three operator families ship both a PLAIN form (one per-key window —
minimal overhead, but a key's whole history serializes onto one task)
and a SKEW-SAFE twin (a (key, time-bucket) pre-split with exact
boundary/carry merge — parallel under hot keys and long histories, at
the cost of an extra tiny aggregate + broadcast join):

========================  ==============================  ==========
plain                     twin                            crossover
========================  ==============================  ==========
timeseries.sessionize     sessionize(skew_buckets=N)      ~1e5 rows/key
stats.rolling_zscore      stats.rolling_zscore_chunked    ~1e5 rows/key
stats.cusum_reflected     stats.cusum_reflected_chunked   >2e6 rows/key
========================  ==============================  ==========

The crossover statements used to live only in docstrings ("plain when
keys >> cores, chunked when histories >> task sort budget") — a 100-TB
user won't read them mid-incident.  This module turns them into an
OPT-IN ``auto`` mode: one cheap probe (a single corpus scan whose
map-side-combined output is one row per key, reduced to four scalars)
and a documented routing rule.  The registered driver queries keep
calling the explicit forms — those are the oracle shapes; ``auto`` is
the deployment convenience.

Routing rule: take the twin iff the probe's ``max_key_rows`` exceeds
``budget_rows`` — the per-task serialized-sort budget.  Defaults come
from the measured A/Bs, not guesses:

- sessionize / rolling_zscore: ``budget_rows=100_000``.  BASELINE.md
  brackets the crossing: plain comfortably wins at ~2e4 rows/key
  (sf0.1 uniform), the twin wins from ~2e5 up (zscore chunked 1.9x at
  sf1 uniform's 203k-row hot signal; sessionize twin 1.55x faster than
  plain on sf10_skew's 5M-row hot user, plain paying 6.16x there).
  1e5 is the bracket midpoint.
- cusum: ``budget_rows=20_000_000``.  The honest negative A/B
  (BASELINE.md r9 addendum 4) shows plain winning at EVERY measurable
  point up to 2M rows/key (an unbounded-prefix fold has no W-row frame
  work for the twin to amortize); the twin exists for histories past a
  task's sort budget (the 630M-rows/key shape).  The default sits 10x
  beyond the largest measured plain-wins point — an extrapolation,
  flagged as such here, refined when a bigger fixture exists.

Probe overhead, measured: 0.94 s on the sf10 events fixture (10M rows,
local[32], warm cache) — under 4% of the cheaper branch of the
operator it routes (chunked zscore 24.7 s there) and amortized by
either outcome; the probe's shuffle ships one row per key.

Reference: the reference SDK has no skew machinery at all (its compute
was remote pandas; src/lookoutequipment/evaluation.py) — this module
is part of the beyond-reference scale layer.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import stats as _stats
from . import timeseries as _timeseries

#: per-task serialized-sort budget (rows of ONE key on one task) for the
#: window-frame family — see module doc for the measured bracket.
WINDOW_BUDGET_ROWS = 100_000

#: cusum's fold has no frame work to amortize; plain wins to at least
#: 2e6 rows/key (measured) — default is 10x beyond that point.
CUSUM_BUDGET_ROWS = 20_000_000

#: twin geometry: aim for ~budget rows of the hot key per (key, bucket)
#: task, capped so tiny carries stay tiny.
MAX_AUTO_BUCKETS = 256


@dataclass(frozen=True)
class KeyProbe:
    """Scalars the router decides from.  ``lo_us``/``hi_us`` are the
    event-time span (microseconds) when a ``ts_col`` was probed, else
    None."""

    n_keys: int
    max_key_rows: int
    total_rows: int
    lo_us: int | None = None
    hi_us: int | None = None


def probe_keys(
    df: DataFrame, key_col: str, ts_col: str | None = None
) -> KeyProbe:
    """ONE corpus scan: groupBy(key).count() partial-aggregates map-side
    (the shuffle ships one row per key, not per event), then a bounded
    second-stage agg reduces to four scalars.  With ``ts_col`` the same
    scan also carries per-key min/max event time, so the twin's bucket
    geometry needs no second pass over the corpus."""
    per_key = [F.count(F.lit(1)).alias("_c")]
    if ts_col is not None:
        us = F.unix_micros(F.col(ts_col))
        per_key += [F.min(us).alias("_lo"), F.max(us).alias("_hi")]
    agg = df.groupBy(key_col).agg(*per_key)
    final = [
        F.count(F.lit(1)).alias("n_keys"),
        F.max("_c").alias("max_key_rows"),
        F.sum("_c").alias("total_rows"),
    ]
    if ts_col is not None:
        final += [F.min("_lo").alias("lo"), F.max("_hi").alias("hi")]
    row = agg.agg(*final).first()
    if row["n_keys"] == 0 or row["total_rows"] is None:
        return KeyProbe(0, 0, 0)
    # all-null ts leaves the span aggregates null — report no span (the
    # routers then fall back to the plain form: a time-bucketed twin is
    # meaningless without event time)
    has_span = ts_col is not None and row["lo"] is not None
    return KeyProbe(
        int(row["n_keys"]),
        int(row["max_key_rows"]),
        int(row["total_rows"]),
        int(row["lo"]) if has_span else None,
        int(row["hi"]) if has_span else None,
    )


def decide_twin(probe: KeyProbe, budget_rows: int) -> bool:
    """The routing rule, isolated so tests pin it on the fixtures."""
    return probe.max_key_rows > budget_rows


def _auto_buckets(probe: KeyProbe, budget_rows: int) -> int:
    """Bucket count putting ~budget_rows of the HOT key in each (key,
    bucket) task (the serialized cost the twin removes), bounded."""
    want = -(-probe.max_key_rows // budget_rows)  # ceil
    return max(2, min(MAX_AUTO_BUCKETS, want))


def sessionize_auto(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_minutes: int = 30,
    tiebreak_col: str | None = None,
    budget_rows: int = WINDOW_BUDGET_ROWS,
) -> DataFrame:
    """:func:`timeseries.sessionize` with the plain/twin choice made by
    the probe.  Identical output either way (the twin is property-pinned
    equal); only the physical plan differs."""
    probe = probe_keys(df, key_col)
    buckets = (
        _auto_buckets(probe, budget_rows)
        if decide_twin(probe, budget_rows)
        else None
    )
    return _timeseries.sessionize(
        df,
        ts_col=ts_col,
        key_col=key_col,
        gap_minutes=gap_minutes,
        tiebreak_col=tiebreak_col,
        skew_buckets=buckets,
    )


def rolling_zscore_auto(
    df: DataFrame,
    window: int,
    value_col: str = "value",
    ts_col: str = "ts",
    key_col: str = "event_type",
    tiebreak_col: str = "event_id",
    scale: int = 100,
    budget_rows: int = WINDOW_BUDGET_ROWS,
) -> DataFrame:
    """:func:`stats.rolling_zscore` or its chunked twin by probe.  The
    twin's ``bucket_span_s`` divides the probed event-time span into
    :func:`_auto_buckets` slices, so the hot key lands ~budget_rows per
    (key, bucket) task regardless of the fixture's clock range."""
    probe = probe_keys(df, key_col, ts_col=ts_col)
    if not decide_twin(probe, budget_rows) or probe.lo_us is None:
        return _stats.rolling_zscore(
            df, window, value_col, ts_col, key_col, tiebreak_col, scale
        )
    span_s = max((probe.hi_us - probe.lo_us) // 1_000_000, 1)
    bucket_span_s = max(span_s // _auto_buckets(probe, budget_rows), 1)
    return _stats.rolling_zscore_chunked(
        df,
        window,
        bucket_span_s=bucket_span_s,
        value_col=value_col,
        ts_col=ts_col,
        key_col=key_col,
        tiebreak_col=tiebreak_col,
        scale=scale,
    )


def cusum_reflected_auto(
    df: DataFrame,
    slack_cents: int = 0,
    value_col: str = "value",
    ts_col: str = "ts",
    key_col: str = "event_type",
    tiebreak_col: str = "event_id",
    scale: int = 100,
    budget_rows: int = CUSUM_BUDGET_ROWS,
) -> DataFrame:
    """:func:`stats.cusum_reflected` or its chunked twin by probe — with
    cusum's own much-higher default budget (see module doc: plain wins
    every measured point; the twin is strictly for histories past a
    task's sort budget)."""
    probe = probe_keys(df, key_col, ts_col=ts_col)
    if not decide_twin(probe, budget_rows) or probe.lo_us is None:
        return _stats.cusum_reflected(
            df, slack_cents, value_col, ts_col, key_col, tiebreak_col,
            scale,
        )
    span_s = max((probe.hi_us - probe.lo_us) // 1_000_000, 1)
    bucket_span_s = max(span_s // _auto_buckets(probe, budget_rows), 1)
    return _stats.cusum_reflected_chunked(
        df,
        bucket_span_s=bucket_span_s,
        slack_cents=slack_cents,
        value_col=value_col,
        ts_col=ts_col,
        key_col=key_col,
        tiebreak_col=tiebreak_col,
        scale=scale,
    )
