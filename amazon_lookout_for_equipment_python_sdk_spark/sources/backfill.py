"""Incremental partition recompute — backfill only what changed.

The daily-pipeline maintenance primitive: a derived table is a
``transform`` over a hive-partitioned source; when a late-arriving
correction rewrites one source partition, recomputing the WHOLE derived
table wastes a cluster-day.  This module fingerprints source partitions
from file metadata (a listing, no data read), compares against the state
recorded at the last build, and recomputes exactly the changed/new
partitions with dynamic partition overwrite (removed partitions are
deleted from the output).

Scale: the decision pass is pure file-listing (driver metadata ops, no
job); the recompute reads only the changed partitions' files (partition
pruning); the write overwrites only those partitions.  State is one JSON
file beside the output — the same pattern as a streaming checkpoint.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from urllib.parse import unquote
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_STATE_FILE = "_backfill_state.json"


def _partition_fingerprints(src_dir: str, partition_col: str) -> dict[str, str]:
    """value -> fingerprint from each partition dir's file metadata
    (relative name, size, mtime-ns).  A listing, not a data read — the
    same signal a lakehouse table format keeps in its manifest."""
    out: dict[str, str] = {}
    for pdir in sorted(glob.glob(os.path.join(src_dir, f"{partition_col}=*"))):
        # hive escapes special chars (%XX) in partition dir names; decode
        # so the value matches the actual column values in isin()
        value = unquote(os.path.basename(pdir).split("=", 1)[1])
        parts = []
        for f in sorted(glob.glob(os.path.join(pdir, "*"))):
            base = os.path.basename(f)
            if base.startswith((".", "_")) or not os.path.isfile(f):
                continue
            st = os.stat(f)
            parts.append(f"{base}:{st.st_size}:{st.st_mtime_ns}")
        out[value] = "|".join(parts)
    return out


def incremental_recompute(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    transform: Callable[[DataFrame], DataFrame],
    partition_col: str,
) -> dict:
    """Bring ``dst_dir`` up to date with ``src_dir`` under ``transform``
    (which must preserve ``partition_col`` in its output), recomputing
    only changed/new source partitions.  Returns
    {recomputed: [...], removed: [...], skipped: [...]}.

    ``transform`` runs once over a frame holding ONLY the changed
    partitions (their filter prunes at the scan); output lands with
    dynamic partition overwrite so untouched partitions are never
    rewritten."""
    cur = _partition_fingerprints(src_dir, partition_col)
    state_path = os.path.join(dst_dir, _STATE_FILE)
    prev: dict[str, str] = {}
    if os.path.exists(state_path):
        prev = json.load(open(state_path))
    if "__HIVE_DEFAULT_PARTITION__" in cur:
        raise ValueError(
            "null partition values are not supported — the recompute "
            "filter cannot address __HIVE_DEFAULT_PARTITION__ by equality; "
            "coalesce the partition column before writing the source"
        )
    changed = sorted(v for v in cur if prev.get(v) != cur[v])
    removed = sorted(v for v in prev if v not in cur)
    skipped = sorted(v for v in cur if v not in changed)
    if changed:
        src = spark.read.parquet(src_dir)
        subset = src.filter(src[partition_col].isin(changed))
        out = transform(subset)
        if partition_col not in out.columns:
            raise ValueError(
                f"transform must keep partition column {partition_col!r}"
            )
        # a changed partition whose transform now emits ZERO rows would be
        # untouched by dynamic overwrite (it only replaces partitions
        # present in the output) — clear all changed partitions first so
        # empties come out empty, not stale
        dirname_of = {
            unquote(os.path.basename(d).split("=", 1)[1]): os.path.basename(d)
            for d in glob.glob(os.path.join(dst_dir, f"{partition_col}=*"))
        }
        for v in changed:
            shutil.rmtree(
                os.path.join(
                    dst_dir, dirname_of.get(v, f"{partition_col}={v}")
                ),
                ignore_errors=True,
            )
        prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            out.write.mode("overwrite").partitionBy(partition_col).parquet(
                dst_dir
            )
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev_mode
            )
    removed_dirs = {
        unquote(os.path.basename(d).split("=", 1)[1]): d
        for d in glob.glob(os.path.join(dst_dir, f"{partition_col}=*"))
    }
    for v in removed:
        shutil.rmtree(
            removed_dirs.get(v, os.path.join(dst_dir, f"{partition_col}={v}")),
            ignore_errors=True,
        )
    os.makedirs(dst_dir, exist_ok=True)
    with open(state_path, "w") as f:
        json.dump(cur, f, sort_keys=True)
    spark.catalog.refreshByPath(dst_dir)
    return {"recomputed": changed, "removed": removed, "skipped": skipped}
