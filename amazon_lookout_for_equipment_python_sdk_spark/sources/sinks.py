"""Sinks: per-component CSV layout + timestamped micro-batch chunks
(SURVEY S8/S9).

The reference's file contracts:
- training layout: one CSV per component directory, timestamps formatted
  ``%Y-%m-%dT%H:%M:%S.%f`` (dataset.py:154-167);
- inference input: ``{component}{delimiter}{yyyyMMddHHmmss}.csv`` chunks,
  one per component per upload slot (dataset.py:303-334,
  scheduler.py:100-101, 198-209).

Spark-first: ``partitionBy`` writes produce the per-component layout in one
distributed job.  The exact-single-file-name contract (a REQUIREMENT of the
scheduler's slot discovery) needs one file per (component, slot): we
repartition by the key so each task writes exactly one part file, then
rename to the contract name — renames are per-file metadata ops on the
driver, proportional to slot count, not data size.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .readers import TRAINING_TS_FORMAT


def write_component_csvs(
    df_long: DataFrame,
    out_dir: str,
    ts_col: str = "timestamp",
    component_col: str = "component",
    tag_col: str = "tagname",
    value_col: str = "value",
) -> None:
    """S8 — one CSV directory per component with the reference's wide
    layout and timestamp format (dataset.py:154-167).

    Long input (ts, component, tag, value) -> per-component wide CSV.
    partitionBy(component) prunes + parallelizes; each component's rows are
    pivoted to wide inside its partition.
    """
    tags = [
        r[0]
        for r in df_long.select(tag_col).distinct().orderBy(tag_col).collect()
    ]
    wide = (
        df_long.groupBy(component_col, ts_col)
        .pivot(tag_col, tags)
        .agg(F.first(value_col, ignorenulls=True))
    )
    out = wide.select(
        component_col,
        F.date_format(ts_col, TRAINING_TS_FORMAT).alias("Timestamp"),
        *tags,
    )
    # one shuffle: co-locate each component, then sort inside its partition —
    # a global orderBy before repartition would pay a full sort and then
    # destroy it (reference CSVs are time-sorted, dataset.py:154-167).
    # component leads the sort so FileFormatWriter's required ordering on
    # partition columns is already satisfied (it would otherwise re-sort by
    # component alone and scramble the Timestamps)
    (
        out.repartition(F.col(component_col))
        .sortWithinPartitions(component_col, "Timestamp")
        .write.mode("overwrite")
        .option("header", True)
        .partitionBy(component_col)
        .csv(out_dir)
    )


def write_inference_chunks(
    df_long: DataFrame,
    out_dir: str,
    frequency_minutes: int = 5,
    delimiter: str = "_",
    ts_col: str = "timestamp",
    component_col: str = "component",
    tag_col: str = "tagname",
    value_col: str = "value",
    filename_ts_format: str = "%Y%m%d%H%M%S",
    slot_col: str | None = None,
    tz_offset_minutes: int = 0,
) -> list[str]:
    """S9 — slot-chunked CSVs named ``{component}{delim}{slot_ts}.csv``
    (reference dataset.py:303-334; scheduler contract scheduler.py:198-209).

    Slot = floor(ts / frequency), or the caller's precomputed ``slot_col``
    (a yyyyMMddHHmmss string — prepare_inference_data restamps slots to
    'now' and can't derive them from the data timestamps).  Writes one
    Spark CSV job partitioned by (component, slot), then renames each
    single part file to the contract name.  Returns written file paths.

    ``tz_offset_minutes`` (F3): file-name stamps are WALL TIME at the
    scheduler's InputTimeZoneOffset (reference localizes before stamping,
    dataset.py:534) — stamp = UTC slot + offset.  EPOCH stamps are
    absolute and exempt, symmetric with the scheduler's read side.
    """
    secs = frequency_minutes * 60
    if slot_col is not None:
        slotted = df_long.withColumnRenamed(slot_col, "_slot")
    else:
        slot_ts = F.timestamp_seconds(
            F.floor(F.unix_timestamp(F.col(ts_col)) / secs) * secs
        )
        if tz_offset_minutes and filename_ts_format != "EPOCH":
            slot_ts = slot_ts + F.make_interval(mins=F.lit(tz_offset_minutes))
        spark_fmt = {
            "%Y%m%d%H%M%S": "yyyyMMddHHmmss",
            "%Y-%m-%d-%H-%M-%S": "yyyy-MM-dd-HH-mm-ss",
        }
        if filename_ts_format == "EPOCH":
            slot_stamp = F.unix_timestamp(slot_ts).cast("string")
        elif filename_ts_format in spark_fmt:
            slot_stamp = F.date_format(slot_ts, spark_fmt[filename_ts_format])
        else:
            raise ValueError(
                f"unsupported filename_ts_format {filename_ts_format!r}; "
                f"use one of {sorted(spark_fmt)} or 'EPOCH'"
            )
        slotted = df_long.withColumn("_slot", slot_stamp)
    tags = [
        r[0]
        for r in df_long.select(tag_col).distinct().orderBy(tag_col).collect()
    ]
    wide = (
        slotted.groupBy(component_col, "_slot", ts_col)
        .pivot(tag_col, tags)
        .agg(F.first(value_col, ignorenulls=True))
    )
    out = wide.select(
        component_col,
        "_slot",
        F.date_format(ts_col, TRAINING_TS_FORMAT).alias("Timestamp"),
        *tags,
    )
    staging = os.path.join(out_dir, "_staging")
    # partition cols lead the in-partition sort so the file writer's
    # required ordering is satisfied and Timestamps stay time-sorted
    # (reference chunk CSVs are sequential, dataset.py:303-334)
    (
        out.repartition(F.col(component_col), F.col("_slot"))
        .sortWithinPartitions(component_col, "_slot", "Timestamp")
        .write.mode("overwrite")
        .option("header", True)
        .partitionBy(component_col, "_slot")
        .csv(staging)
    )
    written: list[str] = []
    for comp_dir in sorted(glob.glob(os.path.join(staging, f"{component_col}=*"))):
        comp = os.path.basename(comp_dir).split("=", 1)[1]
        for slot_dir in sorted(glob.glob(os.path.join(comp_dir, "_slot=*"))):
            slot = os.path.basename(slot_dir).split("=", 1)[1]
            parts = glob.glob(os.path.join(slot_dir, "part-*.csv"))
            if not parts:
                continue
            dest = os.path.join(out_dir, f"{comp}{delimiter}{slot}.csv")
            if len(parts) == 1:
                shutil.move(parts[0], dest)
            else:  # defensive: concatenate (repartition should prevent this)
                with open(dest, "wb") as fout:
                    for i, p in enumerate(sorted(parts)):
                        with open(p, "rb") as fin:
                            data = fin.read()
                            if i > 0:  # strip duplicate header
                                data = data.split(b"\n", 1)[1]
                            fout.write(data)
            written.append(dest)
    shutil.rmtree(staging)
    return written
