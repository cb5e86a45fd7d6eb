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


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    keys: list[str],
    attrs: list[str],
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """SCD-2 MERGE: apply a batch of updates to a validity-interval
    history table, preserving full change lineage.

    ``history`` rows carry ``[valid_from, valid_to)`` (NULL valid_to =
    current).  For each update whose attributes differ from the key's
    current row: the current row CLOSES (valid_to = update ts) and a new
    current row opens (valid_from = update ts).  No-change updates are
    dropped (the standard idempotent-feed rule); keys new to the history
    insert directly.  ``updates`` must be unique per key (pre-compact a
    changelog with :func:`cdc_latest`).

    Late data: an update whose ts is EARLIER than the current row's
    ``valid_from`` is *stale* — applying it would write an inverted
    interval (valid_to < valid_from) into the history.  Stale updates
    are dropped and the current row survives unchanged; the feed is
    assumed monotone per key ACROSS batches (within a batch
    :func:`cdc_latest` compacts to the newest version).  This mirrors
    the monotone-input assumption ``compact_runs`` documents; callers
    needing late-update replay must rebuild the key's history from the
    raw changelog instead.

    Plan: ONE key-shuffle full-outer join of CURRENT rows against the
    updates; each joined row expands row-local (array + explode — no
    branch refilters, so the join is computed once) into its outcome
    rows: keep / close+open / insert.  Closed history unions through
    untouched — never rewritten, which is what makes daily SCD-2
    feasible on a 100 TB history (with bucketed storage the join is
    zero-exchange)."""
    cur = history.filter(F.col(valid_to).isNull())
    closed = history.filter(F.col(valid_to).isNotNull())
    u = updates.select(
        *[F.col(k) for k in keys],
        *[F.col(a).alias(f"_u_{a}") for a in attrs],
        F.col(ts_col).alias("_u_ts"),
    )
    j = cur.join(u, keys, "full_outer")
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~(F.col(a).eqNullSafe(F.col(f"_u_{a}")))
    has_cur = F.col(valid_from).isNotNull()
    has_upd = F.col("_u_ts").isNotNull()
    # out-of-order guard: an update older than the open row's valid_from
    # would invert the interval — treat as no-op (monotone-feed contract)
    stale = has_cur & has_upd & (F.col("_u_ts") < F.col(valid_from))

    null_ts = F.lit(None).cast("timestamp")

    def out_struct(attr_cols, vf, vt, cond):
        return F.when(
            cond,
            F.struct(
                *[c.alias(a) for a, c in zip(attrs, attr_cols)],
                vf.alias(valid_from),
                vt.alias(valid_to),
            ),
        )

    old_attrs = [F.col(a) for a in attrs]
    new_attrs = [F.col(f"_u_{a}") for a in attrs]
    candidates = F.array(
        # surviving current row: no update, identical attrs, or stale update
        out_struct(
            old_attrs, F.col(valid_from), null_ts,
            has_cur & (~has_upd | ~changed | stale),
        ),
        # closing row: current version superseded by a differing fresh update
        out_struct(
            old_attrs, F.col(valid_from), F.col("_u_ts"),
            has_cur & has_upd & changed & ~stale,
        ),
        # opening row: differing fresh update, or brand-new key
        out_struct(
            new_attrs, F.col("_u_ts"), null_ts,
            has_upd & (~has_cur | (changed & ~stale)),
        ),
    )
    expanded = j.select(
        *keys,
        F.explode(
            F.filter(candidates, lambda x: x.isNotNull())
        ).alias("_o"),
    ).select(
        *keys,
        *[F.col(f"_o.{a}").alias(a) for a in attrs],
        F.col(f"_o.{valid_from}").alias(valid_from),
        F.col(f"_o.{valid_to}").alias(valid_to),
    )
    return closed.select(*keys, *attrs, valid_from, valid_to).unionByName(
        expanded
    )


# --- bucket-pruned SCD-2 for fact-sized histories ---------------------------
#
# Plain parquet has no MERGE, so a naive SCD-2 batch rewrites the WHOLE
# history (fine for dimension tables; see streaming/pipeline.py).  The
# fact-scale answer: lay the history out hash-bucketed on the key
# (hive partition dirs `_bucket=N/`), then each merge batch (1) derives
# the update keys' touched buckets, (2) partition-prunes the history scan
# to those buckets, (3) rewrites ONLY those bucket directories with the
# same crash-safe rename swap the streaming sink uses.  A batch touching
# 0.1% of keys reads and writes ~0.1% of a 100 TB history; untouched
# bucket files are never opened (pinned byte-identical in
# tests/test_merge.py).

BUCKET_COL = "_bucket"


def _bucket_expr(keys: list[str], n_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets))


def scd2_write_bucketed(
    history: DataFrame, path: str, keys: list[str], n_buckets: int = 64
) -> None:
    """Materialize an SCD-2 history in the bucket-pruned layout:
    hive-partitioned by ``_bucket = pmod(xxhash64(keys), n_buckets)``
    with a sidecar recording the bucketing spec."""
    import json
    import os

    (
        history.withColumn(BUCKET_COL, _bucket_expr(keys, n_buckets))
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )
    with open(os.path.join(path, "_scd2_buckets.json"), "w") as fh:
        json.dump({"keys": keys, "n_buckets": n_buckets}, fh)


def scd2_apply_bucketed(
    spark,
    path: str,
    updates: DataFrame,
    attrs: list[str],
    ts_col: str = "ts",
) -> dict:
    """Apply an SCD-2 update batch to a bucket-partitioned history
    IN PLACE, rewriting only the bucket directories containing updated
    keys.  Returns {touched_buckets, total_buckets}.

    Shape: the touched-bucket set is a distinct over the (small) update
    batch collected to the driver (bounded by n_buckets); the history
    scan filters on the PARTITION column so pruning happens at planning
    time — untouched directories are never listed into the scan.  The
    rewrite stages each touched bucket to a temp dir and swaps via
    renames only (park old -> move new -> drop parked), per bucket, so a
    crash leaves every bucket in exactly one recoverable state; a
    leftover park from a crashed swap is restored on the next run before
    merging.  Parks live OUTSIDE the table dir (sibling
    ``<path>.__prev/<bucket>``): a parked dir named ``_bucket=N.__prev``
    INSIDE the table would survive Spark's hidden-path filter (which
    only skips '_'/'.'-prefixed names without '='), so any direct
    ``spark.read.parquet(path)`` between a crash and the next merge
    would read it as an extra partition — duplicate rows plus a
    string-inferred ``_bucket`` (r6 ADVICE)."""
    import json
    import os
    import shutil

    with open(os.path.join(path, "_scd2_buckets.json")) as fh:
        meta = json.load(fh)
    keys, n_buckets = meta["keys"], meta["n_buckets"]

    def bdir(b: int) -> str:
        return os.path.join(path, f"{BUCKET_COL}={b}")

    # crash recovery: restore any bucket whose previous swap died after
    # parking the old dir but before the new one landed
    prev_root = path.rstrip("/") + ".__prev"
    if os.path.isdir(prev_root):
        for name in os.listdir(prev_root):
            live = os.path.join(path, name)
            if not os.path.exists(live):
                os.rename(os.path.join(prev_root, name), live)
            else:
                shutil.rmtree(os.path.join(prev_root, name))
    # legacy in-table parks from pre-r7 crashes
    for name in os.listdir(path):
        if name.endswith(".__prev"):
            live = os.path.join(path, name[: -len(".__prev")])
            if not os.path.exists(live):
                os.rename(os.path.join(path, name), live)
            else:
                shutil.rmtree(os.path.join(path, name))

    u = updates.withColumn(BUCKET_COL, _bucket_expr(keys, n_buckets))
    touched = sorted(
        r[BUCKET_COL] for r in u.select(BUCKET_COL).distinct().collect()
    )
    if not touched:
        return {"touched_buckets": 0, "total_buckets": n_buckets}
    hist = spark.read.parquet(path).filter(
        F.col(BUCKET_COL).isin([int(b) for b in touched])
    )
    merged = scd2_apply(
        hist.drop(BUCKET_COL), updates, keys, attrs, ts_col=ts_col
    ).withColumn(BUCKET_COL, _bucket_expr(keys, n_buckets))
    tmp = path + ".__stage"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(tmp)
    os.makedirs(prev_root, exist_ok=True)
    for b in touched:
        src = os.path.join(tmp, f"{BUCKET_COL}={b}")
        live = bdir(b)
        prev = os.path.join(prev_root, f"{BUCKET_COL}={b}")
        if not os.path.exists(src):
            # all rows of this bucket's keys merged away (cannot happen
            # for SCD-2, which never deletes — defensive)
            os.makedirs(src)
        if os.path.exists(live):
            os.rename(live, prev)
        os.rename(src, live)
        shutil.rmtree(prev, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(prev_root, ignore_errors=True)
    spark.catalog.refreshByPath(path)
    return {"touched_buckets": len(touched), "total_buckets": n_buckets}
