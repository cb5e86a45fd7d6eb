"""MERGE / CDC operators: SCD-1 upsert and changelog compaction.

The ingest primitives every warehouse pipeline needs (Delta/Iceberg MERGE
INTO semantics, re-expressed as plain DataFrame algebra so they run on any
parquet layout):

- :func:`merge_upsert` — SCD-1 MERGE: matched target rows are replaced by
  the update, unmatched updates are inserted.  One anti-join shuffle on
  the key; with both sides written via ``sinks.write_bucketed`` on the key
  the exchange disappears entirely (the daily-ingest scale path).
- :func:`cdc_latest` — changelog compaction: keep each key's latest row
  by (ts, tiebreak).  One per-key window; compiles to Spark's
  WindowGroupLimit (map-side local top-1 before the shuffle) so the
  shuffle carries candidates, not history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame, updates: DataFrame, keys: list[str]
) -> DataFrame:
    """SCD-1 MERGE INTO: rows of ``updates`` win over matching ``target``
    rows; unmatched updates are appended.  Schemas must match by name.

    ``updates`` must be unique per key (the MERGE contract — enforce with
    :func:`cdc_latest` first on raw changelogs); duplicate update keys
    would both survive, exactly as ``MERGE INTO`` would raise."""
    kept = target.join(updates.select(*keys), keys, "left_anti")
    return updates.unionByName(kept)


def cdc_latest(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Latest row per key from a change log: row_number over
    (ts DESC, tiebreak DESC) == 1.

    The rank-1 window compiles to WindowGroupLimit: each map task keeps
    only its local latest per key before the shuffle, so a key with a
    million historical versions ships O(#tasks) rows, not a million."""
    order = [F.col(ts_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
