"""Auto-routing between plain operators and their skew-safe twins
(r9 verdict #5).

Ten operator families ship both a PLAIN form (one per-key window —
minimal overhead, but a key's whole history serializes onto one task)
and a SKEW-SAFE twin (a (key, time-bucket) pre-split with exact
boundary/carry merge — parallel under hot keys and long histories, at
the cost of an extra tiny aggregate + broadcast join):

==============================  ====================================  ==========
plain                           twin                                  crossover
==============================  ====================================  ==========
timeseries.sessionize           sessionize(skew_buckets=N)            ~1e5 rows/key
stats.rolling_zscore            stats.rolling_zscore_chunked          ~1e5 rows/key
stats.cusum_reflected           stats.cusum_reflected_chunked         ~1.5e5 rows/key
timeseries.asof_join            timeseries.asof_join_chunked          ~1.5e6 rows/key (union of both tables — r11)
timeseries.lead_pairs           timeseries.lead_pairs_chunked         ~4e6 rows/key (r11)
timeseries.restamp_positional   timeseries.restamp_positional_chunked ~6e5 rows/key (r11)
timeseries.ffill                timeseries.ffill_chunked              ~2e6 rows/key (r11; flagship fill)
timeseries.rolling_range        timeseries.rolling_range_chunked      rows x frame-rows product ~3e7 (r11; compute-bound, not sort-bound)
stats.ewma                      stats.ewma_chunked                    ~1e5 rows/key (r11; fixed 64-row fold/row)
corpus.pack_documents           corpus.pack_documents_chunked         ~2e6 rows/group (r12; prefix sum on the numeric doc-id axis)
==============================  ====================================  ==========

The crossover statements used to live only in docstrings ("plain when
keys >> cores, chunked when histories >> task sort budget") — a 100-TB
user won't read them mid-incident.  This module turns them into an
OPT-IN ``auto`` mode: one cheap probe (a single corpus scan whose
map-side-combined output is one row per key, reduced to four scalars)
and a documented routing rule.  The registered driver queries keep
calling the explicit forms — those are the oracle shapes; ``auto`` is
the deployment convenience.

Routing rule: take the twin iff the probe's ``max_key_rows`` exceeds
``budget_rows`` — the per-task serialized-sort budget.  Defaults are
DERIVED FROM THE SESSION (r10 verdict #2): a per-key window's cost
cliff is where one key's history outgrows a task's execution memory
and the sort spills, so the budget scales linearly with per-task
execution memory (``heap x spark.memory.fraction / cores``).  The
measured calibration points anchor the line:

- sessionize / rolling_zscore: ``100_000`` rows/key at this box's
  0.3 GiB/task (local[32], 16 GiB heap, fraction 0.6).  BASELINE.md
  brackets the crossing: plain comfortably wins at ~2e4 rows/key
  (sf0.1 uniform), the twin wins from ~2e5 up (zscore chunked 1.9x at
  sf1 uniform's 203k-row hot signal; sessionize twin 1.55x faster than
  plain on sf10_skew's 5M-row hot user, plain paying 6.16x there).
  1e5 is the bracket midpoint.  A 4 GB/core cluster therefore routes
  at a higher crossover than a 1 GB/core one — pinned in
  tests/test_routing.py.
- cusum: ``150_000`` rows/key at the same calibration point.  The r9
  "plain wins every measured point to 2M" claim (and the 2e7
  extrapolated default it anchored) was a MEASUREMENT ARTIFACT: the
  old ``.count()`` bench drain let Catalyst prune the rollup's
  aggregate expressions and elide the entire window pipeline — the
  plain side was timing a bare ``distinct`` (BASELINE.md r11
  addendum; tools/drain_audit.py now makes the hazard visible).  The
  r11 re-measurement with an un-prunable drain (max over the cusum
  column) on hot-key-dominant fixtures (tools/gen_cusum_xl.py, 100k
  to 50M rows/key at 0.9 GiB/task) brackets the true crossover at
  300k-600k rows/key there — plain 1.6x faster at 100k-300k, the
  twin 1.25x at 600k growing to 12.7x at 50M — i.e. the same
  serialized-sort cliff as the window family, just shifted ~3x
  higher by cusum's lighter per-row frame work.  450k at 0.9
  GiB/task maps to 150k at the 0.3 GiB/task anchor.

Pass ``budget_rows`` explicitly to pin a decision (tests do); pass a
precomputed :class:`KeyProbe` via ``probe=`` to amortize the probe
scan across several routed operators over the same frame (r10 verdict
#4) — ALL the autos accept the same probe shape (as-of wants one
built over the two tables' union; a keyless lead/restamp probe is the
whole frame as one key, see :func:`_probe_maybe_keyless`).  Build a
SHARED probe with ``ts_col=`` set: sessionize ignores the span
fields, but every other auto falls back to the plain form when the
probe carries no event-time span (a time-bucketed twin is meaningless
without one).

Probe overhead, measured: 0.94 s on the sf10 events fixture (10M rows,
local[32], warm cache) — under 4% of the cheaper branch of the
operator it routes (chunked zscore 24.7 s there) and amortized by
either outcome; the probe's shuffle ships one row per key.

Reference: the reference SDK has no skew machinery at all (its compute
was remote pandas; src/lookoutequipment/evaluation.py) — this module
is part of the beyond-reference scale layer.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import stats as _stats
from . import timeseries as _timeseries

#: per-task serialized-sort budget (rows of ONE key on one task) for the
#: window-frame family AT THE CALIBRATION POINT below — see module doc
#: for the measured bracket.
WINDOW_BUDGET_ROWS = 100_000

#: cusum's crossover, r11-measured on hot-key-dominant fixtures with an
#: un-prunable drain (see module doc: the r9 2e7 figure came from an
#: elided-plan measurement): bracket 300k-600k rows/key at 0.9
#: GiB/task -> 150k at the calibration anchor.
CUSUM_BUDGET_ROWS = 150_000

#: as-of join's crossover, r11-measured AT the calibration anchor on
#: the gen_cusum_xl fixture family (tools/bench_asof_ab.py, noop
#: drain, BASELINE.md r11 addendum 4): plain 1.3x faster at 100k-315k
#: rows/key, a TIE at 1.05M (ratio 1.06), twin 1.7x at 5.25M and 3.2x
#: at 21M.  The constant sits just above the tie so borderline keys
#: take the twin's flat path (<=6% mis-route cost near the tie, vs the
#: plain sort's super-linear blowup above).  ~15x the window family's
#: budget — the as-of fill does far less per-row frame work than a
#: rolling aggregate, so the serialized sort dominates much later.
ASOF_BUDGET_ROWS = 1_500_000

#: lead_pairs' crossover (one ``lead`` over the per-key sort — no
#: frame aggregate, no second table), r11-measured AT the calibration
#: anchor on the gen_cusum_xl fixtures (tools/bench_lead_ab.py, noop
#: drain, BASELINE.md r11 addendum 5): plain ahead through 3M rows/key
#: (twin 1.26x slower there), the twin ahead from 5M (1.84x faster)
#: widening to 3.4x at both 10M and 30M.  4e6 is the 3M-5M bracket
#: midpoint.  ~2.7x the as-of budget: this sorts ONE narrow table
#: where as-of sorts both sides' union with a struct payload, so far
#: more rows fit the same task memory before the sort spills.
LEAD_BUDGET_ROWS = 4_000_000

#: restamp_positional's crossover (one ``row_number`` over the same
#: sort), from the same r11 series: plain ahead at 300k (twin 1.68x
#: slower), the twin already ahead at 1M (0.88x) and 3M (0.85x),
#: decisively from 5M (2.3x) to 30M (5.5x).  600k is the 300k-1M
#: bracket's geometric midpoint.  Lower than lead's because the twin
#: side is CHEAPER here, not the plain side dearer: the offset table
#: is a count aggregate (map-side combined) where lead's boundary
#: table aggregates min timestamps, and the restamp twin's output
#: column is pure arithmetic off the local rank.
RESTAMP_BUDGET_ROWS = 600_000

#: forward-fill's crossover (one ``last ignorenulls`` over the per-key
#: sort — the fill inside the flagship resample_ffill idiom), from the
#: same r11 fixture series (tools/bench_ffill_ab.py, sparse 1-in-20
#: non-null values, BASELINE.md r11 addendum 6): plain ahead at 300k
#: (2.0x) and 1M (1.26x), the twin ahead from 3M (1.35x) through 30M
#: (3.6x).  2e6 is the 1M-3M bracket midpoint — between restamp's and
#: lead's, consistent with a twin whose carry is a max_by aggregate
#: (cheaper than lead's min-timestamp boundary + left join, dearer
#: than restamp's bare count).
FFILL_BUDGET_ROWS = 2_000_000

#: the event-time range-frame family routes on a COMPUTE PRODUCT, not
#: a row budget: Spark evaluates a trailing RANGE frame by rescanning
#: the frame per row (measured — NOT incremental), so the per-key cost
#: is max_key_rows x frame_rows, where frame_rows ~ the key's event
#: density x range_s.  The r11 series (tools/bench_range_ab.py, dense
#: 1 ev/s and sparse 1 ev/100s cadences, BASELINE.md r11 addendum 7)
#: is inseparable by rows alone — 100k dense rows route twin (1.8x)
#: while 300k sparse rows route plain (1.07) — but separates cleanly
#: on the product: plain at 1.1e7, twin from 1.1e8 (3.3x) up through
#: 3.6e9 (4.2x).  3e7 is the bracket's geometric midpoint.  NOT
#: memory-scaled: this crossover is where fan-out across cores beats
#: one task's serial frame evaluation, calibrated on local[32] — the
#: sort-spill regime is covered separately by the window row budget.
RANGE_PRODUCT_BUDGET = 30_000_000

#: EWMA's crossover (collect_list of the trailing 64 rows + Horner
#: fold per row — heavy FIXED per-row frame work), r11-measured at the
#: anchor (tools/bench_ewma_ab.py, BASELINE.md r11 addendum 8): plain
#: 1.7x ahead at 30k rows/key, an exact TIE at 100k (0.996), the twin
#: from 300k (1.23x) through 3M (5.4x) and 10M (5.2x).  The constant
#: sits ON the measured tie — numerically equal to the window family's
#: anchor but measured independently; the fixed 64-row fold makes this
#: family compute-heavy per row, so fan-out pays far earlier than the
#: light-rank families.
EWMA_BUDGET_ROWS = 100_000

#: pack family (corpus.pack_documents / assemble_packs, r12 — the last
#: serialized-sort-cliff member, r11 verdict #4), measured AT the
#: calibration anchor on monolithic-group fixtures (tools/gen_pack_xl.py
#: + bench_pack_ab.py, un-prunable max(pack_offset) drain, BASELINE.md
#: r12 addendum 2): plain ahead at 300k-1M rows/group (twin 1.26-1.36x
#: slower), near-tie at 2M (twin 1.08x), the twin ahead from 3M (1.37x
#: faster) through 5M (1.22x) to 20M (1.62x).  The constant sits at the
#: 2M near-tie so borderline groups take the twin's flat path (<=8%
#: mis-route cost there vs plain's super-linear climb above).  ~3x the
#: restamp budget despite the same prefix-sum work class: pack's cumsum
#: input is one int per row (token counts computed row-local before the
#: exchange) where restamp sorts full event rows, so far more rows fit
#: a task's sort memory.
PACK_BUDGET_ROWS = 2_000_000

#: per-task execution memory where the constants above were
#: bracketed: local[32], 16 GiB heap, spark.memory.fraction 0.6
#: -> 16 GiB * 0.6 / 32 tasks.  Session-derived budgets scale the
#: constants linearly from this anchor (r10 verdict #2).
CALIB_PER_TASK_BYTES = int(16 * (1 << 30) * 0.6) // 32

#: floor for derived budgets: below ~10k rows/key the twin's extra
#: aggregate + broadcast join always costs more than the plain window.
MIN_BUDGET_ROWS = 10_000

#: twin geometry: aim for ~budget rows of the hot key per (key, bucket)
#: task, capped so tiny carries stay tiny.
MAX_AUTO_BUCKETS = 256

#: worst-case rows in the twins' carry/offset tables (one per non-empty
#: (key, bucket)) — those tables are BROADCAST, so the bucket span may
#: never be so fine that n_keys x corpus-span-buckets exceeds this.
#: Guards the r10 hot-key-span geometry: a hot key concentrated in one
#: hour of a year-wide corpus wants 360s buckets, but at 360s every
#: COLD key spanning the year could contribute ~87k carry rows; the
#: span floor below trades the narrow hot slice's fan-out away exactly
#: when the key count makes the carry broadcast dangerous (correctness
#: never depends on the span).
CARRY_BUDGET_ROWS = 1_000_000

_MEM_SUFFIX = {
    "b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40,
}


def _parse_mem(s: str) -> int:
    """JVM-style memory string -> bytes.  Bare numbers are MiB (Spark's
    convention for ``spark.{driver,executor}.memory``)."""
    m = re.fullmatch(r"\s*(\d+)\s*([bkmgt]?)b?\s*", str(s).lower())
    if not m:
        raise ValueError(f"unparseable memory string: {s!r}")
    return int(m.group(1)) * _MEM_SUFFIX.get(m.group(2) or "m", 1 << 20)


def per_task_exec_bytes(spark: SparkSession) -> int:
    """Execution memory one task can use for its sort, from the session
    conf: ``heap x spark.memory.fraction / concurrent tasks``.  Local
    masters read the driver heap and the ``local[N]`` core count;
    cluster masters read ``spark.executor.memory`` / ``.cores``.  Uses
    the conf as declared — in local mode a ``spark.driver.memory`` set
    after JVM launch is what the conf reports, same as Spark's own UI.

    ``spark.sparkgraft.routing.perTaskExecBytes`` overrides the whole
    derivation (JVM memory string; bare numbers are MiB) — the seam for
    deployments where heap/cores conf does not reflect reality (off-heap
    execution memory, container memory limits, dynamic allocation)."""
    conf = spark.conf
    override = conf.get("spark.sparkgraft.routing.perTaskExecBytes", None)
    if override:
        return max(_parse_mem(override), 1)
    master = conf.get("spark.master", "") or ""
    # NB: local-cluster[...] deliberately takes the cluster branch — its
    # executors size from spark.executor.memory, not the driver heap
    if master == "local" or master.startswith("local["):
        heap = _parse_mem(conf.get("spark.driver.memory", "1g"))
        # local[N], local[N,maxFailures], local[*], local[*,F], bare local
        m = re.match(r"local\[(\*|\d+)(?:,\d+)?\]", master)
        if m and m.group(1) != "*":
            cores = int(m.group(1))
        elif master == "local":
            cores = 1
        else:
            cores = os.cpu_count() or 1
    else:
        heap = _parse_mem(conf.get("spark.executor.memory", "1g"))
        cores = int(conf.get("spark.executor.cores", "1"))
    frac = float(conf.get("spark.memory.fraction", "0.6"))
    return max(int(heap * frac) // max(cores, 1), 1)


def derive_budget_rows(
    base_rows: int, per_task_bytes: int
) -> int:
    """Scale a calibration-point budget to this cluster's per-task
    memory.  Pure so tests pin 4 GB/core vs 16 GB/core routing without
    building two JVMs."""
    scaled = base_rows * per_task_bytes // CALIB_PER_TASK_BYTES
    return max(MIN_BUDGET_ROWS, scaled)


def session_budget_rows(
    spark: SparkSession, base_rows: int = WINDOW_BUDGET_ROWS
) -> int:
    """The budget the autos use when the caller passes none."""
    return derive_budget_rows(base_rows, per_task_exec_bytes(spark))


@dataclass(frozen=True)
class KeyProbe:
    """Scalars the router decides from.  ``lo_us``/``hi_us`` are the
    corpus event-time span (microseconds) when a ``ts_col`` was probed,
    else None; ``hot_lo_us``/``hot_hi_us`` are the HOT KEY'S OWN span —
    bucket geometry divides that one, not the corpus span, so a hot key
    concentrated in a narrow slice of a wide corpus still gets the full
    intended fan-out (r10 ADVICE)."""

    n_keys: int
    max_key_rows: int
    total_rows: int
    lo_us: int | None = None
    hi_us: int | None = None
    hot_lo_us: int | None = None
    hot_hi_us: int | None = None


def probe_keys(
    df: DataFrame,
    key_col: str,
    ts_col: str | None = None,
    numeric_axis: bool = False,
) -> KeyProbe:
    """ONE corpus scan: groupBy(key).count() partial-aggregates map-side
    (the shuffle ships one row per key, not per event), then a bounded
    second-stage agg reduces to scalars.  With ``ts_col`` the same scan
    also carries per-key min/max event time — both the corpus span and
    the hot key's own span (``max_by`` on the per-key counts) — so the
    twin's bucket geometry needs no second pass over the corpus.

    ``numeric_axis=True`` probes ``ts_col`` as a plain NUMERIC order
    axis (the pack family's doc-id axis, r12): lo/hi then carry the
    axis values themselves rather than epoch microseconds, and the
    matching geometry helper is :func:`_bucket_span_ids`."""
    per_key = [F.count(F.lit(1)).alias("_c")]
    if ts_col is not None:
        if numeric_axis:
            us = F.col(ts_col).cast("long")
        else:
            # cast: unix_micros rejects TIMESTAMP_NTZ (the decade
            # fixtures ship NTZ); the engine session runs UTC so the
            # cast is value-preserving, and the span only feeds bucket
            # geometry
            us = F.unix_micros(F.col(ts_col).cast("timestamp"))
        per_key += [F.min(us).alias("_lo"), F.max(us).alias("_hi")]
    agg = df.groupBy(key_col).agg(*per_key)
    final = [
        F.count(F.lit(1)).alias("n_keys"),
        F.max("_c").alias("max_key_rows"),
        F.sum("_c").alias("total_rows"),
    ]
    if ts_col is not None:
        final += [
            F.min("_lo").alias("lo"),
            F.max("_hi").alias("hi"),
            F.max_by(F.struct("_lo", "_hi"), "_c").alias("hot"),
        ]
    row = agg.agg(*final).first()
    if row["n_keys"] == 0 or row["total_rows"] is None:
        return KeyProbe(0, 0, 0)
    # all-null ts leaves the span aggregates null — report no span (the
    # routers then fall back to the plain form: a time-bucketed twin is
    # meaningless without event time)
    has_span = ts_col is not None and row["lo"] is not None
    hot = row["hot"] if has_span else None
    hot_ok = hot is not None and hot["_lo"] is not None
    return KeyProbe(
        int(row["n_keys"]),
        int(row["max_key_rows"]),
        int(row["total_rows"]),
        int(row["lo"]) if has_span else None,
        int(row["hi"]) if has_span else None,
        int(hot["_lo"]) if hot_ok else None,
        int(hot["_hi"]) if hot_ok else None,
    )


def decide_twin(probe: KeyProbe, budget_rows: int) -> bool:
    """The routing rule, isolated so tests pin it on the fixtures.

    The key-count guard (r11 review): with more keys than
    ``CARRY_BUDGET_ROWS`` even ONE bucket per key makes the twins'
    broadcast carry/offset tables exceed the budget — no span can save
    it — so a hot key among millions of keys routes PLAIN (the hot
    key's one-task sort is slow but bounded; an OOM'd carry broadcast
    is neither).  That regime is the module doc's "keys >> cores"
    plain case taken to its limit."""
    return (
        probe.max_key_rows > budget_rows
        and probe.n_keys <= CARRY_BUDGET_ROWS
    )


def _auto_buckets(probe: KeyProbe, budget_rows: int) -> int:
    """Bucket count putting ~budget_rows of the HOT key in each (key,
    bucket) task (the serialized cost the twin removes), bounded."""
    want = -(-probe.max_key_rows // budget_rows)  # ceil
    return max(2, min(MAX_AUTO_BUCKETS, want))


def _bucket_span_s(probe: KeyProbe, budget_rows: int) -> int:
    """Seconds per (key, bucket) slice.  Divides the HOT KEY'S span
    when the probe carried one (a hot key concentrated in a narrow
    slice of a wide corpus still fans out as intended — r10 ADVICE);
    falls back to the corpus span for probes built before that field
    existed or when the hot key's timestamps were all null.

    FLOORED so the carry/offset tables stay broadcastable (r11): the
    worst-case carry size is n_keys x (corpus_span / span), bounded to
    ``CARRY_BUDGET_ROWS``.  With few keys (the twins' home regime) the
    floor is far below the hot-span geometry and never binds; with very
    many keys it coarsens the buckets — the hot key loses fan-out
    before the carry broadcast can OOM."""
    lo = probe.hot_lo_us if probe.hot_lo_us is not None else probe.lo_us
    hi = probe.hot_hi_us if probe.hot_hi_us is not None else probe.hi_us
    span_s = max((hi - lo) // 1_000_000, 1)
    want = max(span_s // _auto_buckets(probe, budget_rows), 1)
    corpus_span_s = max((probe.hi_us - probe.lo_us) // 1_000_000, 1)
    allowed_per_key = max(CARRY_BUDGET_ROWS // max(probe.n_keys, 1), 1)
    # CEILING division (review fix): floor division under-sized the
    # span by up to 2x, letting the worst-case carry overshoot the
    # budget by the same factor
    floor = -(-corpus_span_s // allowed_per_key)
    return max(want, floor, 1)


def _bucket_span_ids(probe: KeyProbe, budget_rows: int) -> int:
    """ID units per (key, bucket) slice — :func:`_bucket_span_s` for a
    NUMERIC order axis (probe built with ``numeric_axis=True``): same
    hot-span fan-out and the same CARRY_BUDGET_ROWS floor, without the
    microsecond conversion."""
    lo = probe.hot_lo_us if probe.hot_lo_us is not None else probe.lo_us
    hi = probe.hot_hi_us if probe.hot_hi_us is not None else probe.hi_us
    span = max(hi - lo, 1)
    want = max(span // _auto_buckets(probe, budget_rows), 1)
    corpus_span = max(probe.hi_us - probe.lo_us, 1)
    allowed_per_key = max(CARRY_BUDGET_ROWS // max(probe.n_keys, 1), 1)
    floor = -(-corpus_span // allowed_per_key)
    return max(want, floor, 1)


def _resolve(
    df: DataFrame,
    key_col: "str | None",
    ts_col: str | None,
    budget_rows: int | None,
    base_rows: int,
    probe: KeyProbe | None,
) -> tuple[KeyProbe, int]:
    """Shared entry logic for the single-frame autos: derive the budget
    from the session when the caller passed none, and run the probe
    scan only when the caller didn't hand one in (probe reuse across
    several routed operators over the same frame — one scan, N
    decisions).  ``key_col=None`` (the lead/restamp keyless shapes)
    probes the frame as one key via :func:`_probe_maybe_keyless`."""
    if budget_rows is None:
        budget_rows = session_budget_rows(df.sparkSession, base_rows)
    if probe is None:
        probe = _probe_maybe_keyless(df, key_col, ts_col)
    return probe, budget_rows


def sessionize_auto(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_minutes: int = 30,
    tiebreak_col: str | None = None,
    budget_rows: int | None = None,
    probe: KeyProbe | None = None,
) -> DataFrame:
    """:func:`timeseries.sessionize` with the plain/twin choice made by
    the probe.  Identical output either way (the twin is property-pinned
    equal); only the physical plan differs.  ``budget_rows=None`` derives
    the crossover from the session's per-task memory; ``probe=`` skips
    the probe scan (share one probe across routed operators)."""
    probe, budget_rows = _resolve(
        df, key_col, None, budget_rows, WINDOW_BUDGET_ROWS, probe
    )
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
    budget_rows: int | None = None,
    probe: KeyProbe | None = None,
) -> DataFrame:
    """:func:`stats.rolling_zscore` or its chunked twin by probe.  The
    twin's ``bucket_span_s`` divides the hot key's probed event-time
    span into :func:`_auto_buckets` slices, so the hot key lands
    ~budget_rows per (key, bucket) task regardless of the fixture's
    clock range."""
    probe, budget_rows = _resolve(
        df, key_col, ts_col, budget_rows, WINDOW_BUDGET_ROWS, probe
    )
    if not decide_twin(probe, budget_rows) or probe.lo_us is None:
        return _stats.rolling_zscore(
            df, window, value_col, ts_col, key_col, tiebreak_col, scale
        )
    return _stats.rolling_zscore_chunked(
        df,
        window,
        bucket_span_s=_bucket_span_s(probe, budget_rows),
        value_col=value_col,
        ts_col=ts_col,
        key_col=key_col,
        tiebreak_col=tiebreak_col,
        scale=scale,
    )


def asof_join_auto(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    key_col: str = "tag",
    payload_cols: "list[str] | None" = None,
    direction: str = "backward",
    tolerance_seconds: "float | None" = None,
    budget_rows: int | None = None,
    probe: KeyProbe | None = None,
) -> DataFrame:
    """:func:`timeseries.asof_join` or its chunked twin by probe (r11 —
    the fourth routed family).  The serialized cost is the per-key sort
    of BOTH tables' rows, so the probe runs over their (key, ts) union,
    under the family's own measured budget (``ASOF_BUDGET_ROWS`` — the
    crossover sits ~15x the window family's; see the constant's doc).
    A shared ``probe=`` must have been built over the same union to
    mean anything."""
    if budget_rows is None:
        budget_rows = session_budget_rows(
            left.sparkSession, ASOF_BUDGET_ROWS
        )
    if probe is None:
        u = left.select(
            F.col(key_col), F.col(ts_col)
        ).unionByName(right.select(F.col(key_col), F.col(ts_col)))
        probe = probe_keys(u, key_col, ts_col=ts_col)
    if not decide_twin(probe, budget_rows) or probe.lo_us is None:
        return _timeseries.asof_join(
            left, right, ts_col=ts_col, key_col=key_col,
            payload_cols=payload_cols, direction=direction,
            tolerance_seconds=tolerance_seconds,
        )
    # DECISION by the family crossover above; bucket GEOMETRY by the
    # per-task sort budget — the twin's slices should stay task-sized
    # for parallel sorts (the measured series' shape: ~1e5-row slices,
    # ~220 buckets at 21M rows/key).  Dividing by the 1.5e6 crossover
    # instead would under-fan a 21M-row key to 14 tasks.
    geom = session_budget_rows(left.sparkSession, WINDOW_BUDGET_ROWS)
    return _timeseries.asof_join_chunked(
        left, right, _bucket_span_s(probe, geom),
        ts_col=ts_col, key_col=key_col, payload_cols=payload_cols,
        direction=direction, tolerance_seconds=tolerance_seconds,
    )


def _probe_maybe_keyless(
    df: DataFrame, key_col: str | None, ts_col: str | None
) -> KeyProbe:
    """Probe for autos whose plain form allows ``key_col=None`` (a
    single-partition GLOBAL sort): the keyless frame is probed as one
    key — ``max_key_rows`` = the whole frame, which is exactly the
    serialized cost the twin would remove."""
    if key_col is not None:
        return probe_keys(df, key_col, ts_col=ts_col)
    return probe_keys(
        df.withColumn("_k", F.lit(1)), "_k", ts_col=ts_col
    )


def lead_pairs_auto(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str | None = None,
    budget_rows: int | None = None,
    probe: KeyProbe | None = None,
) -> DataFrame:
    """:func:`timeseries.lead_pairs` or its chunked twin by probe (r11 —
    the fifth routed family, with :func:`restamp_positional_auto` as the
    sixth; each has its own measured budget, see ``LEAD_BUDGET_ROWS`` /
    ``RESTAMP_BUDGET_ROWS``).  ``key_col=None`` probes the frame as ONE
    key — the plain form's global sort is the serialized cost in that
    shape."""
    probe, budget_rows = _resolve(
        df, key_col, ts_col, budget_rows, LEAD_BUDGET_ROWS, probe
    )
    if not decide_twin(probe, budget_rows) or probe.lo_us is None:
        return _timeseries.lead_pairs(df, ts_col=ts_col, key_col=key_col)
    # decision by the family crossover; bucket GEOMETRY task-sized (the
    # asof_join_auto precedent — dividing by the 4e6 crossover would
    # under-fan a 30M-row key to 8 tasks)
    geom = session_budget_rows(df.sparkSession, WINDOW_BUDGET_ROWS)
    return _timeseries.lead_pairs_chunked(
        df, _bucket_span_s(probe, geom), ts_col=ts_col, key_col=key_col
    )


def restamp_positional_auto(
    df: DataFrame,
    new_start: str,
    step_seconds: int,
    ts_col: str = "ts",
    key_col: str | None = None,
    tiebreak_col: str | None = None,
    budget_rows: int | None = None,
    probe: KeyProbe | None = None,
) -> DataFrame:
    """:func:`timeseries.restamp_positional` or its chunked twin by
    probe — the sixth routed family.  Its measured crossover sits ~7x
    BELOW :func:`lead_pairs_auto`'s despite the near-identical plain
    form (one rank over the same per-key sort): the restamp twin's
    boundary table is a count aggregate and its output pure arithmetic,
    so the twin side is cheaper (``RESTAMP_BUDGET_ROWS``; BASELINE.md
    r11 addendum 5).  ``key_col=None`` probes the frame as one key (the
    plain form's documented single-partition global-sort hazard — the
    twin is the scale answer to exactly that warning)."""
    probe, budget_rows = _resolve(
        df, key_col, ts_col, budget_rows, RESTAMP_BUDGET_ROWS, probe
    )
    if not decide_twin(probe, budget_rows) or probe.lo_us is None:
        return _timeseries.restamp_positional(
            df, new_start, step_seconds, ts_col=ts_col, key_col=key_col,
            tiebreak_col=tiebreak_col,
        )
    geom = session_budget_rows(df.sparkSession, WINDOW_BUDGET_ROWS)
    return _timeseries.restamp_positional_chunked(
        df, new_start, step_seconds, _bucket_span_s(probe, geom),
        ts_col=ts_col, key_col=key_col, tiebreak_col=tiebreak_col,
    )


def ffill_auto(
    df: DataFrame,
    value_col: str,
    ts_col: str = "bucket_ts",
    key_col: str = "tag",
    out_col: str | None = None,
    budget_rows: int | None = None,
    probe: KeyProbe | None = None,
) -> DataFrame:
    """:func:`timeseries.ffill` or its chunked twin by probe (r11 — the
    seventh routed family; the fill inside the flagship resample_ffill
    idiom, where rows-per-key is SPAN-bounded — a decade of 1-minute
    slots is ~5M rows per key regardless of event volume, past this
    budget on its own).  Budget ``FFILL_BUDGET_ROWS`` (measured; see
    the constant's doc)."""
    probe, budget_rows = _resolve(
        df, key_col, ts_col, budget_rows, FFILL_BUDGET_ROWS, probe
    )
    if not decide_twin(probe, budget_rows) or probe.lo_us is None:
        return _timeseries.ffill(
            df, value_col, ts_col=ts_col, key_col=key_col, out_col=out_col
        )
    geom = session_budget_rows(df.sparkSession, WINDOW_BUDGET_ROWS)
    return _timeseries.ffill_chunked(
        df, value_col, _bucket_span_s(probe, geom),
        ts_col=ts_col, key_col=key_col, out_col=out_col,
    )


def est_frame_rows(probe: KeyProbe, range_s: int) -> float:
    """Hot key's expected trailing-frame size: its event density (rows
    over its OWN probed span) times the frame reach — CAPPED at the
    key's row count (a frame can never hold more rows than the key
    has; without the cap a 1-second dense burst under an hour-long
    range inflates the product by range/span and misroutes a tiny key
    to the twin — r11 review).

    ASSUMES UNIFORM DENSITY over the hot key's span (r11 ADVICE): a
    bursty key — a dense burst inside a long sparse tail — averages
    out to a LOW density here, so the estimate can undercount the
    burst's true frame size and route the range family PLAIN, paying
    the per-row frame rescan on one task.  Output stays correct either
    way; this is a perf-only bias, and it is one-sided (the
    max_key_rows cap already kills the opposite, dense-burst-short-span
    inflation).  A burst-aware measure (max per-range-bucket count)
    would need a range_s-dependent probe aggregation, breaking the ONE
    shared family-agnostic ``KeyProbe`` scan all nine routed families
    reuse — not worth it for a perf bias.  Callers with known-bursty
    keys can lower ``product_budget`` on :func:`rolling_range_auto` or
    call :func:`timeseries.rolling_range_chunked` directly."""
    lo = probe.hot_lo_us if probe.hot_lo_us is not None else probe.lo_us
    hi = probe.hot_hi_us if probe.hot_hi_us is not None else probe.hi_us
    span_us = max((hi - lo), 1)
    est = probe.max_key_rows * (int(range_s) * 1_000_000) / span_us
    return min(float(probe.max_key_rows), est)


def decide_range_twin(
    probe: KeyProbe,
    range_s: int,
    product_budget: int = RANGE_PRODUCT_BUDGET,
    rows_budget: "int | None" = None,
) -> bool:
    """The range family's routing rule (see ``RANGE_PRODUCT_BUDGET``):
    twin when the hot key's frame-evaluation product exceeds the
    compute budget, OR when its rows alone exceed the window sort
    budget (the spill regime — a sparse decade-long key can spill its
    sort long before the frames get expensive)."""
    if probe.max_key_rows == 0 or probe.lo_us is None:
        return False
    product = probe.max_key_rows * max(est_frame_rows(probe, range_s), 1.0)
    rows_over = (
        rows_budget is not None and probe.max_key_rows > rows_budget
    )
    return product > product_budget or rows_over


def ewma_auto(
    df: DataFrame,
    alpha: float,
    window: int = 64,
    value_col: str = "avg_value",
    order_col: str = "bucket_ts",
    key_col: str = "event_type",
    tiebreak_col: str | None = None,
    budget_rows: int | None = None,
    probe: KeyProbe | None = None,
) -> DataFrame:
    """:func:`stats.ewma` or its chunked twin by probe (r11 — the ninth
    routed family).  Budget ``EWMA_BUDGET_ROWS`` (measured; the fixed
    64-row fold per row makes the fan-out pay at the window anchor —
    see the constant's doc).  Like the fill family, ewma's scale case
    is span-bounded: it runs over resampled series, so a decade of
    5-min buckets crosses the budget by construction."""
    probe, budget_rows = _resolve(
        df, key_col, order_col, budget_rows, EWMA_BUDGET_ROWS, probe
    )
    if not decide_twin(probe, budget_rows) or probe.lo_us is None:
        return _stats.ewma(
            df, alpha, window=window, value_col=value_col,
            order_col=order_col, key_col=key_col,
            tiebreak_col=tiebreak_col,
        )
    geom = session_budget_rows(df.sparkSession, WINDOW_BUDGET_ROWS)
    return _stats.ewma_chunked(
        df, alpha, _bucket_span_s(probe, geom), window=window,
        value_col=value_col, order_col=order_col, key_col=key_col,
        tiebreak_col=tiebreak_col,
    )


def rolling_range_auto(
    df: DataFrame,
    range_s: int,
    agg_fn,
    ts_col: str = "ts",
    key_col: str = "tag",
    product_budget: int | None = None,
    probe: KeyProbe | None = None,
) -> DataFrame:
    """:func:`timeseries.rolling_range` or its chunked twin by probe
    (r11 — the eighth routed family, and the one family that routes on
    a COMPUTE PRODUCT rather than a row budget: see
    ``RANGE_PRODUCT_BUDGET`` and :func:`decide_range_twin`).  The
    twin's bucket span is the window-budget geometry FLOORED at
    ``range_s`` (a frame may span at most one bucket boundary), which
    also caps the context-replication overhead at ``range_s/span``."""
    if product_budget is None:
        product_budget = RANGE_PRODUCT_BUDGET
    if probe is None:
        probe = probe_keys(df, key_col, ts_col=ts_col)
    rows_budget = session_budget_rows(df.sparkSession, WINDOW_BUDGET_ROWS)
    if not decide_range_twin(probe, range_s, product_budget, rows_budget):
        return _timeseries.rolling_range(
            df, range_s, agg_fn, ts_col=ts_col, key_col=key_col
        )
    span = max(_bucket_span_s(probe, rows_budget), int(range_s))
    return _timeseries.rolling_range_chunked(
        df, range_s, agg_fn, span, ts_col=ts_col, key_col=key_col
    )


def cusum_reflected_auto(
    df: DataFrame,
    slack_cents: int = 0,
    value_col: str = "value",
    ts_col: str = "ts",
    key_col: str = "event_type",
    tiebreak_col: str = "event_id",
    scale: int = 100,
    budget_rows: int | None = None,
    probe: KeyProbe | None = None,
) -> DataFrame:
    """:func:`stats.cusum_reflected` or its chunked twin by probe — with
    cusum's own slightly-higher default budget (see module doc: the
    crossover sits ~1.5x the window family's, r11-measured from 100k to
    50M rows/key after the r9 elided-drain artifact was found)."""
    probe, budget_rows = _resolve(
        df, key_col, ts_col, budget_rows, CUSUM_BUDGET_ROWS, probe
    )
    if not decide_twin(probe, budget_rows) or probe.lo_us is None:
        return _stats.cusum_reflected(
            df, slack_cents, value_col, ts_col, key_col, tiebreak_col,
            scale,
        )
    return _stats.cusum_reflected_chunked(
        df,
        bucket_span_s=_bucket_span_s(probe, budget_rows),
        slack_cents=slack_cents,
        value_col=value_col,
        ts_col=ts_col,
        key_col=key_col,
        tiebreak_col=tiebreak_col,
        scale=scale,
    )


def pack_documents_auto(
    df: DataFrame,
    budget_tokens: int = 2048,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    budget_rows: int | None = None,
    probe: KeyProbe | None = None,
) -> DataFrame:
    """:func:`corpus.pack_documents` or its chunked twin by probe (r12 —
    the tenth routed family, closing the serialized-sort-cliff class:
    r11 verdict #4).  The order axis is the NUMERIC doc id, so the
    probe runs with ``numeric_axis=True`` and the bucket geometry is
    :func:`_bucket_span_ids`; a non-numeric id (or all-null ids) routes
    PLAIN — the value-based split needs a numeric axis, and string-id
    corpora use :func:`corpus.pack_documents_greedy` with ``scan_rows``
    for the hard-cap shape instead.  Budget ``PACK_BUDGET_ROWS``
    (prefix-sum work class — the restamp anchor; family-own A/B in
    tools/bench_pack_ab.py, BASELINE.md r12 addendum 2)."""
    from . import corpus as _corpus

    numeric_id = df.schema[id_col].dataType.typeName() in (
        "long", "integer", "short", "byte",
    )
    if budget_rows is None:
        budget_rows = session_budget_rows(df.sparkSession, PACK_BUDGET_ROWS)
    if numeric_id and probe is None:
        probe = probe_keys(df, group_col, ts_col=id_col, numeric_axis=True)
    if (
        not numeric_id
        or not decide_twin(probe, budget_rows)
        or probe.lo_us is None
    ):
        return _corpus.pack_documents(
            df, budget_tokens=budget_tokens, group_col=group_col,
            text_col=text_col, id_col=id_col,
        )
    geom = session_budget_rows(df.sparkSession, WINDOW_BUDGET_ROWS)
    return _corpus.pack_documents_chunked(
        df,
        budget_tokens=budget_tokens,
        bucket_span_ids=_bucket_span_ids(probe, geom),
        group_col=group_col,
        text_col=text_col,
        id_col=id_col,
    )


def assemble_packs_auto(
    df: DataFrame,
    budget_tokens: int = 512,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = " ",
    budget_rows: int | None = None,
    probe: KeyProbe | None = None,
) -> DataFrame:
    """:func:`corpus.assemble_packs` or its chunked twin by the same
    probe/budget rule as :func:`pack_documents_auto` (the assembly
    rollup is already (group, pack)-parallel in both forms; only the
    assignment cumsum differs)."""
    from . import corpus as _corpus

    numeric_id = df.schema[id_col].dataType.typeName() in (
        "long", "integer", "short", "byte",
    )
    if budget_rows is None:
        budget_rows = session_budget_rows(df.sparkSession, PACK_BUDGET_ROWS)
    if numeric_id and probe is None:
        probe = probe_keys(df, group_col, ts_col=id_col, numeric_axis=True)
    if (
        not numeric_id
        or not decide_twin(probe, budget_rows)
        or probe.lo_us is None
    ):
        return _corpus.assemble_packs(
            df, budget_tokens=budget_tokens, group_col=group_col,
            text_col=text_col, id_col=id_col, sep=sep,
        )
    geom = session_budget_rows(df.sparkSession, WINDOW_BUDGET_ROWS)
    return _corpus.assemble_packs_chunked(
        df,
        budget_tokens=budget_tokens,
        bucket_span_ids=_bucket_span_ids(probe, geom),
        group_col=group_col,
        text_col=text_col,
        id_col=id_col,
        sep=sep,
    )
