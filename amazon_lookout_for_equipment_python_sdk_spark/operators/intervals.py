"""Interval semantics: range join, range<->point conversion, run compaction.

Covers SURVEY J1 (point-in-range stamping, reference evaluation.py:206-216 /
plot.py:325-331), N5 (range -> point expansion, plot.py:320-333), and M2
(point predictions -> (start,end) ranges, the inverse, via gaps-and-islands).

Scale design (SURVEY §4.2.1): a naive ``p.ts BETWEEN r.start AND r.end``
join is a broadcast-nested-loop at best.  ``range_join_bucketed`` buckets
both sides by a coarse time block — points get one block, ranges explode to
every block they overlap (ranges are short relative to the data span, so
this is a small constant factor) — turning the theta-join into an equi-join
on (key, block) + residual BETWEEN, i.e. a shuffle/broadcast HASH join whose
cost scales linearly.  At 100 TB the block size is tuned to the p99 range
length; skew (one giant range) is bounded because a range contributes one
row per overlapped block, not per point.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def expand_ranges(
    ranges: DataFrame,
    step_seconds: int,
    start_col: str = "start",
    end_col: str = "end",
    extra_cols: list[str] | None = None,
    ts_name: str = "ts",
) -> DataFrame:
    """N5 — ranges -> per-step point series (reference ``pd.date_range`` fill,
    plot.py:320-333).  sequence()+explode, JVM-side."""
    cols = list(extra_cols or [])
    return ranges.select(
        *cols,
        F.explode(
            F.sequence(
                F.col(start_col),
                F.col(end_col),
                F.make_interval(secs=F.lit(step_seconds)),
            )
        ).alias(ts_name),
    )


def range_join_bucketed(
    points: DataFrame,
    ranges: DataFrame,
    block_seconds: int = 3600,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    key_cols: list[str] | None = None,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """J1 — stamp each point with matching range payloads (left join).

    Equi-join on (key, time-block) with residual BETWEEN (see module doc).
    Points matching no range keep null payloads.  A point inside two
    overlapping ranges yields two rows (caller aggregates; the reference's
    0/1/2 stamping uses ``stamp_points``).
    """
    keys = key_cols or []
    payload = payload_cols or []
    blk = F.lit(block_seconds)
    p = points.withColumn("_blk", F.floor(F.unix_timestamp(F.col(ts_col)) / blk))
    # range-side keys join under a reserved alias and are dropped after:
    # they are redundant (equal to the point's by the join condition, or
    # NULL on a miss) and the shared name would be ambiguous downstream
    r = ranges.select(
        *[F.col(k).alias(f"_rk_{k}") for k in keys],
        start_col,
        end_col,
        *payload,
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / blk),
                F.floor(F.unix_timestamp(F.col(end_col)) / blk),
            )
        ).alias("_blk"),
    )
    cond = (
        [p["_blk"] == r["_blk"]]
        + [p[k] == r[f"_rk_{k}"] for k in keys]
        + [p[ts_col] >= r[start_col], p[ts_col] <= r[end_col]]
    )
    return p.join(r, reduce(lambda a, b: a & b, cond), "left").drop(
        "_blk", *[f"_rk_{k}" for k in keys]
    )


def stamp_points(
    points: DataFrame,
    predicted: DataFrame,
    labeled: DataFrame | None = None,
    ts_col: str = "ts",
    block_seconds: int = 3600,
) -> DataFrame:
    """Reference evaluation.py:206-224: prediction = 0 normal, 1 inside a
    predicted range, 2 inside a labeled range (labels win).

    ZERO shuffles of the point set and exact row multiplicity: both range
    tables are tagged with their code (1/2), unioned, block-bucketed, and
    collapsed to one broadcast row per block holding that block's range
    array.  Each point left-joins its block (broadcast hash join) and
    computes ``max(code over containing ranges)`` ROW-LOCALLY with
    filter/transform/array_max — no groupBy, so duplicate point rows pass
    through 1:1 and nothing depends on nondeterministic row ids.  Labels
    win because 2 > 1.
    """
    sets = []
    for ranges, code in ((predicted, 1), (labeled, 2)):
        if ranges is not None:
            sets.append(
                ranges.select("start", "end", F.lit(code).alias("_code"))
            )
    if not sets:
        return points.withColumn("prediction", F.lit(0))
    all_ranges = reduce(DataFrame.unionByName, sets)
    blk = F.lit(block_seconds)
    r_blocks = (
        all_ranges.select(
            F.struct("start", "end", "_code").alias("_r"),
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col("start")) / blk),
                    F.floor(F.unix_timestamp(F.col("end")) / blk),
                )
            ).alias("_blk"),
        )
        .groupBy("_blk")
        .agg(F.collect_list("_r").alias("_rs"))
    )
    p = points.withColumn(
        "_blk", F.floor(F.unix_timestamp(F.col(ts_col)) / blk)
    )
    joined = p.join(F.broadcast(r_blocks), "_blk", "left")
    ts = F.col(ts_col)
    code_here = F.array_max(
        F.transform(
            F.filter(
                F.col("_rs"),
                lambda r: (ts >= r["start"]) & (ts <= r["end"]),
            ),
            lambda r: r["_code"],
        )
    )
    return joined.withColumn(
        "prediction", F.coalesce(code_here, F.lit(0))
    ).drop("_blk", "_rs")


def compact_runs(
    points: DataFrame,
    flag: Column | str,
    ts_col: str = "ts",
    key_col: str | None = None,
    step_seconds: int | None = None,
) -> DataFrame:
    """M2 — contiguous runs of flagged points -> (start, end) ranges
    (gaps-and-islands: lag-based change detection + running sum run-id;
    SURVEY §4.2.4, reference ModelMetrics predicted_ranges semantics,
    evaluation.py:96-117).

    ``step_seconds``: when given, a time gap larger than the step also
    breaks a run — required when the input holds only flagged points
    (no explicit 0-state rows between ranges).

    Returns (key?, start, end, n_points).  Partitioned per key; the window
    is per-signal so no global single-partition sort at scale.
    """
    fcol = F.col(flag) if isinstance(flag, str) else flag
    keys = [key_col] if key_col else []
    w = Window.partitionBy(*keys).orderBy(ts_col)
    df = points.withColumn("_f", fcol.cast("int"))
    breaks = F.lag("_f").over(w).isNull() | (F.lag("_f").over(w) != F.col("_f"))
    if step_seconds is not None:
        gap = F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(w))
        breaks = breaks | (gap > step_seconds)
    df = df.withColumn("_new_run", F.when(breaks, 1).otherwise(0))
    df = df.withColumn(
        "_run",
        F.sum("_new_run").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        df.filter(F.col("_f") == 1)
        .groupBy(*keys, "_run")
        .agg(
            F.min(ts_col).alias("start"),
            F.max(ts_col).alias("end"),
            F.count("*").alias("n_points"),
        )
        .drop("_run")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    block_seconds: int = 3600,
    left_cols: tuple[str, str] = ("start", "end"),
    right_cols: tuple[str, str] = ("start", "end"),
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Interval x interval overlap join: pairs where
    ``l.start < r.end AND r.start < l.end`` (half-open overlap) — the
    downtime-correlation / maintenance-window-conflict join.

    Same block-bucket strategy as :func:`range_join_bucketed` lifted to
    two interval sides: BOTH explode into the time blocks they touch,
    the join is an equi-join on (key, block) with the residual overlap
    predicate, and cross-block duplicates are owned by the FIRST block
    the overlap itself touches (max of the two starts) — pure row-local
    arithmetic, no distinct shuffle.  At 100 TB each side's explode is
    bounded by interval-length/block, and the equi-join shuffles only
    block-matched rows — never the quadratic interval cross product."""
    keys = key_cols or []
    blk = F.lit(block_seconds)
    ls, le = left_cols
    rs, re_ = right_cols

    def blocked(df, s_col, e_col, prefix):
        # half-open [s, e): the end-boundary block matters only when the
        # interval extends into it.  ALL columns ride through with the
        # side prefix (payloads included), the interval pair normalized
        # to {prefix}_start/{prefix}_end.
        passthrough = [
            F.col(c).alias(f"{prefix}_{c}")
            for c in df.columns
            if c not in (s_col, e_col)
        ]
        # microsecond-exact block indices: whole-second truncation
        # (unix_timestamp) drops sub-second boundaries into the wrong
        # block and can miss genuinely overlapping pairs
        span_us = blk * F.lit(1_000_000).cast("long")
        return df.select(
            *passthrough,
            F.col(s_col).alias(f"{prefix}_start"),
            F.col(e_col).alias(f"{prefix}_end"),
            F.explode(
                F.sequence(
                    F.floor(F.unix_micros(F.col(s_col)) / span_us),
                    F.floor(
                        (F.unix_micros(F.col(e_col)) - 1) / span_us
                    ),
                )
            ).alias("_blk"),
        )

    lb = blocked(left, ls, le, "l")
    rb = blocked(right, rs, re_, "r")
    cond = [lb["_blk"] == rb["_blk"]]
    cond += [lb[f"l_{k}"] == rb[f"r_{k}"] for k in keys]
    cond += [
        lb["l_start"] < rb["r_end"],
        rb["r_start"] < lb["l_end"],
    ]
    joined = lb.join(rb, reduce(lambda a, b: a & b, cond))
    # first-block ownership: the overlap's own first block emits the pair
    overlap_start = F.greatest(F.col("l_start"), F.col("r_start"))
    own = F.floor(
        F.unix_micros(overlap_start) / (blk * F.lit(1_000_000).cast("long"))
    )
    return joined.filter(lb["_blk"] == own).drop("_blk")
