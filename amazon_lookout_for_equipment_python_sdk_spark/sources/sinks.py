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


def _component_tag_map(
    df_long: DataFrame, component_col: str, tag_col: str
) -> dict[str, list[str]]:
    """{component: sorted tag list} from the data (one tiny distinct job —
    the result is metadata-sized: #components x #tags rows)."""
    comp_tags: dict[str, list[str]] = {}
    for r in df_long.select(component_col, tag_col).distinct().collect():
        comp_tags.setdefault(r[0], []).append(r[1])
    return {c: sorted(ts) for c, ts in comp_tags.items()}


def _component_line_expr(
    comp_tags: dict[str, list[str]],
    component_col: str,
    ts_str_col,
) -> "F.Column":
    """CSV data line PER COMPONENT: each component's line carries ONLY its
    own tag columns (reference files never contain other components'
    sensors, dataset.py:160-162) — a CASE over the component name inside
    one job, instead of per-component jobs or an all-tags pivot.  Doubles
    render via CAST AS STRING (same representation Spark's CSV writer
    uses); nulls become empty fields."""
    line = None
    for comp, tags in sorted(comp_tags.items()):
        branch = F.concat_ws(
            ",",
            ts_str_col,
            *[
                F.coalesce(F.col(t).cast("string"), F.lit(""))
                for t in tags
            ],
        )
        cond = F.col(component_col) == comp
        line = F.when(cond, branch) if line is None else line.when(cond, branch)
    return line


def _component_header_expr(
    comp_tags: dict[str, list[str]], component_col: str
) -> "F.Column":
    """Header line per component: ``Timestamp,<its own tags>``."""
    hdr = None
    for comp, tags in sorted(comp_tags.items()):
        branch = F.lit("Timestamp," + ",".join(tags))
        cond = F.col(component_col) == comp
        hdr = F.when(cond, branch) if hdr is None else hdr.when(cond, branch)
    return hdr


def write_component_csvs(
    df_long: DataFrame,
    out_dir: str,
    ts_col: str = "timestamp",
    component_col: str = "component",
    tag_col: str = "tagname",
    value_col: str = "value",
) -> None:
    """S8 — one CSV directory per component with the reference's wide
    layout, PER-COMPONENT columns, and timestamp format
    (dataset.py:154-167: each component's CSV holds Timestamp + that
    component's sensors only).

    Long input (ts, component, tag, value) -> per-component wide CSV in
    ONE Spark job: pivot over the tag union, then serialize each row to
    its component's CSV line via a CASE expression; header lines ride the
    same write as rank-0 rows.  partitionBy(component) prunes +
    parallelizes.
    """
    spark = df_long.sparkSession
    comp_tags = _component_tag_map(df_long, component_col, tag_col)
    all_tags = sorted({t for ts in comp_tags.values() for t in ts})
    wide = (
        df_long.groupBy(component_col, ts_col)
        .pivot(tag_col, all_tags)
        .agg(F.first(value_col, ignorenulls=True))
    )
    ts_str = F.date_format(ts_col, TRAINING_TS_FORMAT)
    data = wide.select(
        F.col(component_col),
        F.lit(1).alias("_ord"),
        ts_str.alias("_ts"),
        _component_line_expr(comp_tags, component_col, ts_str).alias("_line"),
    )
    headers = spark.createDataFrame(
        [
            (c, 0, "", "Timestamp," + ",".join(tags))
            for c, tags in comp_tags.items()
        ],
        f"{component_col} string, _ord int, _ts string, _line string",
    )
    # one shuffle: co-locate each component, header first then time-sorted
    # rows — the sort leads with the partition column so FileFormatWriter
    # doesn't re-sort (which would scramble the Timestamps)
    (
        data.unionByName(headers)
        .repartition(F.col(component_col))
        .sortWithinPartitions(component_col, "_ord", "_ts")
        .select(component_col, "_line")
        .write.mode("overwrite")
        .partitionBy(component_col)
        .text(out_dir)
    )
    # schema inference walks for *.csv — rename the text parts (metadata
    # ops, one per component partition)
    for comp_dir in glob.glob(os.path.join(out_dir, f"{component_col}=*")):
        for p in glob.glob(os.path.join(comp_dir, "part-*.txt")):
            shutil.move(p, p[: -len(".txt")] + ".csv")


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
    'now' and can't derive them from the data timestamps).  Each
    component's chunk carries ONLY its own sensor columns (the reference
    builds every component file from its subsystem's tag subset,
    dataset.py:310; the scheduler's per-component header validation
    rejects foreign columns).  One Spark job partitioned by
    (component, slot) — per-component CSV lines via a CASE expression,
    headers riding as rank-0 rows — then per-file metadata renames to the
    contract names.  Returns written file paths.

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
    comp_tags = _component_tag_map(df_long, component_col, tag_col)
    all_tags = sorted({t for ts in comp_tags.values() for t in ts})
    wide = (
        slotted.groupBy(component_col, "_slot", ts_col)
        .pivot(tag_col, all_tags)
        .agg(F.first(value_col, ignorenulls=True))
    )
    ts_str = F.date_format(ts_col, TRAINING_TS_FORMAT)
    data = wide.select(
        F.col(component_col),
        F.col("_slot"),
        F.lit(1).alias("_ord"),
        ts_str.alias("_ts"),
        _component_line_expr(comp_tags, component_col, ts_str).alias("_line"),
    )
    # per-(component, slot) header rows: the pair set comes from the
    # PRE-pivot lineage (slotted) — deriving it from `wide` would re-run
    # the whole groupBy+pivot aggregate just to enumerate header keys
    headers = (
        slotted.select(component_col, "_slot")
        .distinct()
        .select(
            component_col,
            "_slot",
            F.lit(0).alias("_ord"),
            F.lit("").alias("_ts"),
            _component_header_expr(comp_tags, component_col).alias("_line"),
        )
    )
    staging = os.path.join(out_dir, "_staging")
    # partition cols lead the in-partition sort so the file writer's
    # required ordering is satisfied: header first, then time-sorted rows
    # (reference chunk CSVs are sequential, dataset.py:303-334)
    (
        data.unionByName(headers)
        .repartition(F.col(component_col), F.col("_slot"))
        .sortWithinPartitions(component_col, "_slot", "_ord", "_ts")
        .select(component_col, "_slot", "_line")
        .write.mode("overwrite")
        .partitionBy(component_col, "_slot")
        .text(staging)
    )
    written: list[str] = []
    for comp_dir in sorted(glob.glob(os.path.join(staging, f"{component_col}=*"))):
        comp = os.path.basename(comp_dir).split("=", 1)[1]
        for slot_dir in sorted(glob.glob(os.path.join(comp_dir, "_slot=*"))):
            slot = os.path.basename(slot_dir).split("=", 1)[1]
            parts = glob.glob(os.path.join(slot_dir, "part-*.txt"))
            if not parts:
                continue
            dest = os.path.join(out_dir, f"{comp}{delimiter}{slot}.csv")
            if len(parts) == 1:
                shutil.move(parts[0], dest)
            else:  # defensive: concatenate (repartition should prevent
                # this; header lines are data rows here, so no stripping)
                with open(dest, "wb") as fout:
                    for p in sorted(parts):
                        with open(p, "rb") as fin:
                            fout.write(fin.read())
            written.append(dest)
    shutil.rmtree(staging)
    return written


# --- bucketed parquet tables (co-located joins at scale) --------------------


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) parquet table.

    Bucketing is the standing answer to repeated big-to-big joins and
    aggregations on the same key at 100 TB: both sides pre-hashed into the
    same ``num_buckets`` on ``bucket_cols`` join/aggregate WITHOUT a
    shuffle (Catalyst proves the partitioning from the table metadata;
    ``tests/test_datamodel_sources.py`` pins the no-Exchange plan).
    ``sort_cols`` additionally pre-sorts inside each bucket, turning
    sort-merge joins into zero-sort merges — the right layout for the
    events table keyed by user/series id.

    Requires a metastore-backed table (``saveAsTable``) — bucketing
    metadata cannot ride a bare ``parquet(path)`` write."""
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else bucket_cols
    writer = df.write.mode(mode).format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else sort_cols
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | str,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as hive-partitioned parquet (``path/col=value/...``).

    Partitioning is the data-SKIPPING layout: a filter on a partition
    column prunes whole directories at planning time, so a query touching
    one day/language/source of a 100 TB corpus reads only that fraction —
    no Spark job even lists the rest.  Complements :func:`write_bucketed`
    (which co-locates JOIN keys): partition on low-cardinality selective
    columns (date, lang, source), bucket on high-cardinality join keys.
    ``tests/test_datamodel_sources.py`` pins the pruned-scan plan
    (PartitionFilters pushed, non-matching files unread).

    Too many distinct values -> tiny files + listing pressure; keep
    partition cardinality in the hundreds-to-thousands."""
    partition_cols = (
        [partition_cols] if isinstance(partition_cols, str) else partition_cols
    )
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_columnar(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_cols: list[str] | str | None = None,
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` in a columnar file format — ``parquet`` or ``orc``.

    Both formats share Spark's vectorized reader, filter pushdown into
    row-group/stripe statistics, and column pruning, so the choice is an
    interop decision (ORC for Hive/Trino estates, parquet elsewhere), not
    a performance fork; ``tests/test_datamodel_sources.py`` pins that an
    ORC scan carries PushedFilters + a pruned ReadSchema exactly like the
    parquet scans do.  ``compression`` defaults to the session codec
    (zstd/snappy); hive-style ``partition_cols`` compose the same way as
    :func:`write_partitioned`."""
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"columnar format must be parquet|orc, got {fmt!r}")
    writer = df.write.mode(mode).format(fmt)
    if compression:
        writer = writer.option("compression", compression)
    if partition_cols:
        partition_cols = (
            [partition_cols] if isinstance(partition_cols, str) else partition_cols
        )
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)


def compact_table(
    spark,
    path: str,
    target_file_mb: int = 128,
    fmt: str = "parquet",
) -> dict:
    """Small-files compaction (the OPTIMIZE maintenance pass): rewrite a
    table directory into ~``target_file_mb`` files.

    Streaming sinks and incremental ingests leave thousands of KB-sized
    files; every later scan then pays per-file open/footer costs and the
    driver pays listing time.  Compaction = read -> coalesce to
    ceil(bytes/target) -> atomic swap (write to ``path/.compact_tmp``,
    move old files out, move new in) — the same observable data, a
    fraction of the file count.  Returns {files_before, files_after,
    bytes}.  Coalesce (not repartition): no shuffle, existing partitions
    concatenate.  For hive-partitioned tables compact each partition
    directory separately (partition columns are not preserved by a
    whole-table rewrite)."""
    import math
    import shutil

    def _visible(d: str) -> list[str]:
        return [
            p
            for p in glob.glob(os.path.join(d, "*"))
            if not os.path.basename(p).startswith((".", "_"))
            and os.path.isfile(p)
        ]

    bak = os.path.join(path, ".compact_bak")
    # crash recovery: a crash between moving originals to .compact_bak and
    # moving the compacted files in leaves the table dir empty — restore
    # the backup before proceeding so the rerun compacts real data instead
    # of writing an empty table over it.  (Leftover .compact_bak alongside
    # visible data files means the crash hit AFTER the new files landed;
    # the backup is then the superseded copy and is discarded below.)
    if os.path.isdir(bak) and _visible(bak) and not _visible(path):
        for p in _visible(bak):
            shutil.move(p, os.path.join(path, os.path.basename(p)))
        shutil.rmtree(bak, ignore_errors=True)

    data_files = _visible(path)
    total_bytes = sum(os.path.getsize(p) for p in data_files)
    n_out = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    tmp = os.path.join(path, ".compact_tmp")
    (
        spark.read.format(fmt)
        .load(path)
        .coalesce(n_out)
        .write.mode("overwrite")
        .format(fmt)
        .save(tmp)
    )
    # crash-safe swap: originals move ASIDE (rename, not delete) before
    # the compacted files move in; only after the new files are in place
    # does the backup go away.  A crash mid-swap leaves every row in
    # either .compact_bak or the table dir — nothing is lost, and the
    # recovery preamble above restores the backup on the next run when
    # the table dir was left without visible data files.
    os.makedirs(bak, exist_ok=True)
    for p in data_files:
        shutil.move(p, os.path.join(bak, os.path.basename(p)))
    for p in glob.glob(os.path.join(tmp, "*")):
        base = os.path.basename(p)
        if not base.startswith((".", "_")):
            shutil.move(p, os.path.join(path, base))
    shutil.rmtree(bak, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    # drop any cached file listings for this path (Spark caches InMemory
    # file indexes; stale entries point at the removed part files)
    spark.catalog.refreshByPath(path)
    after = [
        p
        for p in glob.glob(os.path.join(path, "*"))
        if not os.path.basename(p).startswith((".", "_"))
        and os.path.isfile(p)
    ]
    return {
        "files_before": len(data_files),
        "files_after": len(after),
        "bytes": total_bytes,
    }
