"""Named queries (SURVEY.md §2 operator inventory) + DuckDB oracle SQL.

Each entry in ``QUERIES`` is ``name -> fn(spark, sf_dir) -> DataFrame``; the
matching ``ORACLE_SQL[name]`` is ANSI SQL DuckDB runs over the same parquet
(views: region nation customer supplier part orders lineitem events documents
embeddings).  Column names/aliases match exactly on both sides.

Float determinism (the driver hash-compares values exactly):
- Engine-level ``round()`` is NOT portable: Spark rounds the shortest decimal
  repr of a double (BigDecimal.valueOf), DuckDB rounds the binary value, so
  results diverge whenever the true value sits on a rounding boundary — which
  happens constantly with 2-decimal source data.
- Therefore every emitted float is produced by a *bit-deterministic* pipeline:
  aggregate exact scaled integers (cents), then only IEEE-deterministic ops
  (+ - * / floor), which give identical bits in both engines.  Where a value
  passes through a genuinely order-dependent float sum (window sums), its true
  value is generic (not on a decimal grid), so ``floor(x*1e4)/1e4``
  quantization is stable.

Conventions:
- 5-minute resample rate (SURVEY A1; reference TargetSamplingRate PT5M,
  model.py:157-158); buckets epoch-aligned floor(ts / rate).
"""

from __future__ import annotations

from collections.abc import Callable
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import timeseries as ts_ops

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}

RATE = 300  # 5-minute resample, seconds
ROLL = 12  # rolling window, buckets (1h of 5-min slots)
ROUND = 4


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read a driver testdata table.

    ``events.ts`` is parquet timestamp[ns], which Spark has no native type
    for — read it as long (legacy conf) and truncate to microseconds with
    exact integer division (matches DuckDB's ``CAST(ts AS TIMESTAMP)``
    truncation bit-for-bit; float division would drift by up to 256 ns).
    """
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# --- deterministic float helpers (Spark side) -------------------------------


def qfloor(c: Column, n: int = ROUND) -> Column:
    """floor(x*10^n)/10^n — IEEE-deterministic quantization (see module doc)."""
    return F.floor(c * F.lit(10.0**n)) / F.lit(10.0**n)


def cents(c: Column) -> Column:
    """Exact integer cents of a 2-decimal double column."""
    return F.round(c * 100).cast("long")


def det_avg(c: Column) -> Column:
    """Bit-deterministic avg of 2-decimal data: sum(cents)/(100*n)."""
    return F.sum(cents(c)) / (F.count(c) * F.lit(100.0))


def det_sum(c: Column) -> Column:
    """Bit-deterministic sum of 2-decimal data."""
    return F.sum(cents(c)) / F.lit(100.0)


# --- the same helpers as SQL text (DuckDB side) -----------------------------


def sql_qfloor(expr: str, n: int = ROUND) -> str:
    return f"floor(({expr}) * 1e{n}) / 1e{n}"


def sql_det_avg(col: str) -> str:
    return f"(sum(CAST(round(({col})*100) AS BIGINT)) / (count({col}) * 100.0))"


def sql_det_sum(col: str) -> str:
    return f"(sum(CAST(round(({col})*100) AS BIGINT)) / 100.0)"


SQL_BUCKET = (
    f"CAST(to_timestamp(floor(epoch(ts)/{RATE})*{RATE}) AS TIMESTAMP)"
)


# ---------------------------------------------------------------------------
# Phase 1 flagship: resample -> ffill -> rolling (A1 + W2/J4 + A10/W1)
# ---------------------------------------------------------------------------

_FLAGSHIP_SQL = f"""
WITH agg AS (
  SELECT event_type, {SQL_BUCKET} AS bucket_ts,
         {sql_det_avg('value')} AS avg_value
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(bucket_ts) AS t0, max(bucket_ts) AS t1 FROM agg GROUP BY 1
), grid AS (
  SELECT event_type, unnest(generate_series(t0, t1, INTERVAL {RATE} SECOND)) AS bucket_ts
  FROM bounds
), filled AS (
  SELECT g.event_type, g.bucket_ts,
         last_value(a.avg_value IGNORE NULLS) OVER (
           PARTITION BY g.event_type ORDER BY g.bucket_ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
  FROM grid g LEFT JOIN agg a
    ON g.event_type = a.event_type AND g.bucket_ts = a.bucket_ts
)
SELECT event_type, bucket_ts, value,
       CASE WHEN count(value) OVER w >= {ROLL}
            THEN {sql_qfloor('avg(value) OVER w')} END AS rolling_avg
FROM filled
WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN {ROLL - 1} PRECEDING AND CURRENT ROW)
"""


@register("flagship_resample_ffill_rolling", _FLAGSHIP_SQL)
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's preprocessing spine (plot.py:232-253 + 533-535):
    5-min tumbling mean per signal -> complete grid + forward fill ->
    1-hour rolling average."""
    events = load(spark, sf_dir, "events")
    agg = events.groupBy(
        "event_type", ts_ops.bucket(F.col("ts"), RATE).alias("bucket_ts")
    ).agg(det_avg(F.col("value")).alias("avg_value"))
    grid = ts_ops.time_grid(events, RATE, ts_col="ts", key_col="event_type")
    filled = ts_ops.ffill(
        grid.join(agg, ["event_type", "bucket_ts"], "left"),
        "avg_value",
        "bucket_ts",
        "event_type",
        out_col="value",
    ).drop("avg_value")
    rolled = ts_ops.rolling_mean(
        filled, ROLL, "value", ts_col="bucket_ts", key_col="event_type"
    )
    return rolled.select(
        "event_type",
        "bucket_ts",
        "value",
        qfloor(F.col("rolling_avg")).alias("rolling_avg"),
    )


# ---------------------------------------------------------------------------
# A1: resample mean (standalone)
# ---------------------------------------------------------------------------


@register(
    "resample_mean",
    f"""
SELECT event_type, {SQL_BUCKET} AS bucket_ts,
       {sql_det_avg('value')} AS avg_value, count(*) AS n_rows
FROM events GROUP BY 1, 2
""",
)
def resample_mean_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — resample(rule).mean() (reference plot.py:249-250)."""
    events = load(spark, sf_dir, "events")
    return events.groupBy(
        "event_type", ts_ops.bucket(F.col("ts"), RATE).alias("bucket_ts")
    ).agg(det_avg(F.col("value")).alias("avg_value"), F.count("*").alias("n_rows"))


# ---------------------------------------------------------------------------
# A2: resample first (deterministic first-by-ts, event_id tiebreak)
# ---------------------------------------------------------------------------


@register(
    "resample_first",
    f"""
SELECT event_type, bucket_ts, value AS first_value FROM (
  SELECT event_type, {SQL_BUCKET} AS bucket_ts, value,
         row_number() OVER (
           PARTITION BY event_type, {SQL_BUCKET}
           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
  FROM events) t WHERE rn = 1
""",
)
def resample_first_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — resample(rule).first() (reference plot.py:673)."""
    events = load(spark, sf_dir, "events")
    out = ts_ops.resample_first(
        events,
        RATE,
        ts_col="ts",
        key_col="event_type",
        value_col="value",
        tiebreak_col="event_id",
    )
    return out.select(
        "event_type", "bucket_ts", F.col("first_value").alias("first_value")
    )


# ---------------------------------------------------------------------------
# A4: global min/max per signal
# ---------------------------------------------------------------------------


@register(
    "minmax_per_signal",
    """
SELECT event_type, min(value) AS min_value, max(value) AS max_value,
       count(*) AS n_rows
FROM events GROUP BY 1
""",
)
def minmax_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — per-signal min/max for bin edges (reference evaluation.py:282-287)."""
    events = load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.count("*").alias("n_rows"),
    )
