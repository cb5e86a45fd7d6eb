"""Wide ("tabular") <-> long ("timeseries") conversions (SURVEY §1.1).

The reference accepts both layouts (plot.py:46-50): wide = Timestamp + one
DOUBLE column per tag; long = (timestamp, value, tagname).  The engine's
canonical at-rest layout is LONG, partitioned by tag/component (SURVEY §4.2
physical-layout note: wide 100+-sensor frames shuffle badly; long form makes
per-signal window ops partition-parallel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def wide_to_long(
    df: DataFrame,
    ts_col: str = "Timestamp",
    tag_col: str = "tagname",
    value_col: str = "value",
) -> DataFrame:
    """Wide -> long via ``stack`` (single projection, no shuffle)."""
    tags = [c for c in df.columns if c != ts_col]
    pairs = ", ".join(f"'{t}', `{t}`" for t in tags)
    return df.select(
        F.col(ts_col).alias("timestamp"),
        F.expr(f"stack({len(tags)}, {pairs}) AS ({tag_col}, {value_col})"),
    ).select("timestamp", value_col, tag_col)


def long_to_wide(
    df: DataFrame,
    ts_col: str = "timestamp",
    tag_col: str = "tagname",
    value_col: str = "value",
    tags: list[str] | None = None,
) -> DataFrame:
    """Long -> wide via groupBy().pivot().  Pass ``tags`` explicitly at
    scale to skip the distinct-values discovery job (and to fix column
    order)."""
    pvt = df.groupBy(F.col(ts_col).alias("Timestamp")).pivot(
        tag_col, tags
    )
    return pvt.agg(F.first(value_col, ignorenulls=True))
