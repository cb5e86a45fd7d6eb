"""Streaming corpus-pipeline operators (stateless / stream-static).

Two ways batch corpus operators carry over to streams:

1. **Row-local operators apply unchanged.**  ``text_stats``,
   ``quality_filter``, ``lang_id``, fingerprints, chunking — any operator
   whose plan is row-local simply accepts a streaming DataFrame; Spark
   plans it incrementally (pinned by tests).
2. **Stream-static joins run per micro-batch via foreachBatch.**
   Decontamination joins each arriving micro-batch against the (small,
   broadcast) eval-suite shingle set with the EXACT batch operator —
   same code path, so batch/stream equivalence is structural: a doc's
   contamination row depends only on its own text + the static eval side,
   never on batch boundaries.

Scale: the eval suite is the broadcast side (benchmarks are MBs against a
100 TB stream); per-batch work is the batch operator's plan — shingling
row-local, broadcast probe, one per-doc rollup within the micro-batch.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .._persist import collect_persists, tracked_persist  # noqa: F401

# --- per-call persist tracking -----------------------------------------------
# foreach_batch_apply must release the caches ITS batch fn created each
# epoch without touching anyone else's: diffing the session-global
# getPersistentRDDs set (the pre-r9 shape) races with concurrent streams
# or jobs in the same session — stream A's epoch cleanup could unpersist
# a frame stream B had just persisted and still needs (not a correctness
# break, Spark recomputes, but it silently defeats the other caller's
# persist).  Since r12 the tracking is an EXPLICIT registry
# (.._persist — every library persist site routes through it, and user
# batch fns opt in via `tracked_persist`), replacing the r9-r11
# thread-local monkeypatch on DataFrame.persist/cache (the three-round
# watch item: global-API-touching, fragile against Spark's class
# layout).  Thread-locality is unchanged — foreachBatch callbacks run
# on their own per-stream callback thread, so concurrent streams never
# see each other's persists.


def _persistent_rdd_count(df: DataFrame):
    """Size of the session's persistent-RDD set, or None where the
    backend doesn't expose it (Spark Connect has no JVM handle)."""
    try:
        return int(
            df.sparkSession.sparkContext._jsc.getPersistentRDDs().size()
        )
    except Exception:
        return None


@contextmanager
def _track_persists():
    """Collect every frame registered via ``.._persist`` ON THIS THREAD
    while the context is open (nesting-safe: the previous collector is
    restored on exit, and an outer context does NOT see an inner one's
    frames — the inner context owns their cleanup).  Library operators
    register automatically (their persist sites route through
    ``note_persist``); user batch fns register by persisting through
    :func:`tracked_persist`.  Raw ``DataFrame.persist``/``rdd.persist``
    calls are NOT captured — they fall to the advisory leak warning in
    ``foreach_batch_apply``."""
    with collect_persists() as frames:
        yield frames


def foreach_batch_apply(
    stream: DataFrame,
    fn: Callable[[DataFrame], DataFrame],
    out_path: str,
    checkpoint_path: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Run a batch transformation over each micro-batch and append the
    result to parquet — the standard shape for stream-static joins and
    other batch-only plans inside Structured Streaming.

    Exactly-once: each micro-batch writes its OWN hive-style
    ``batch_epoch=N`` sub-directory with overwrite, so a replayed batch
    rewrites rather than duplicates; reading the parent directory sees
    every batch plus a ``batch_epoch`` audit column (partition
    discovery).  The checkpoint and output directories are a UNIT (the
    same contract as Spark's native file sinks): restarting with a fresh
    checkpoint over an existing output dir re-numbers epochs and must
    use a fresh output dir too."""

    def run(batch_df: DataFrame, _epoch: int) -> None:
        # Batch operators that persist (decontaminate_spans' survivor
        # sliver, duplicate_spans' cand) are session-bounded when called
        # once, but HERE they run once per micro-batch — without cleanup a
        # long stream accumulates one cached frame per epoch, leaning on
        # LRU eviction for storage pressure.  Track exactly the frames
        # THIS batch fn persists (explicit thread-local registry — NOT a
        # diff of the session-global persistent-RDD set, which would race
        # with a concurrent stream's persists in the same session and
        # unpersist caches it still needs) and release them once this epoch's
        # output has materialized (the write is the only consumer, so
        # nothing recomputes after).
        before = _persistent_rdd_count(batch_df)
        with _track_persists() as cached:
            # one sub-directory per epoch, written with overwrite: a
            # replayed micro-batch rewrites ITS OWN directory instead of
            # appending a duplicate — this is what makes foreachBatch
            # exactly-once here
            fn(batch_df).write.mode("overwrite").parquet(
                os.path.join(out_path, f"batch_epoch={_epoch}")
            )
        for frame in cached:
            frame.unpersist(False)
        if not cached:
            # ADVICE r9 (mechanism swapped r12): persists made OUTSIDE
            # the explicit registry — raw DataFrame.persist in a user
            # batch fn, rdd.persist, Connect frames — are invisible to
            # the epoch cleanup and would silently reintroduce the
            # per-epoch cache leak.  Detect exactly that signature: the
            # batch fn registered nothing, yet the session's persistent-
            # RDD set grew across the batch.
            after = _persistent_rdd_count(batch_df)
            if before is not None and after is not None and after > before:
                import warnings

                warnings.warn(
                    f"foreach_batch_apply epoch {_epoch}: persistent-RDD "
                    f"count grew {before} -> {after} but the persist "
                    f"registry recorded no frames — the batch fn may "
                    f"persist outside the registry (raw DataFrame."
                    f"persist, Connect frame, rdd.persist); those caches "
                    f"would accumulate one per epoch.  ADVISORY ONLY — "
                    f"the count is session-global, so a CONCURRENT "
                    f"stream or job persisting in the same session "
                    f"during this batch produces the same signature "
                    f"(false positive), and a concurrent unpersist can "
                    f"mask a true leak",
                    RuntimeWarning,
                    stacklevel=2,
                )

    writer = (
        stream.writeStream.foreachBatch(run)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_contamination_check(
    stream: DataFrame,
    eval_df: DataFrame,
    out_path: str,
    checkpoint_path: str,
    shingle_n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> StreamingQuery:
    """Streaming twin of ``operators.corpus.contamination_check``: every
    arriving training doc is scored against the static eval suite the
    moment its micro-batch lands.

    Batch-equal BY CONSTRUCTION: the per-batch function IS the batch
    operator, and a doc's row depends only on its own shingles plus the
    static eval side — so replaying a corpus in any batch split yields
    exactly the batch run's rows (pytest-pinned)."""
    from ..operators.corpus import contamination_check

    return foreach_batch_apply(
        stream,
        lambda b: contamination_check(
            b, eval_df, shingle_n=shingle_n, text_col=text_col, id_col=id_col
        ),
        out_path,
        checkpoint_path,
    )


def streaming_decontaminate_spans(
    stream: DataFrame,
    eval_df: DataFrame,
    out_path: str,
    checkpoint_path: str,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> StreamingQuery:
    """Streaming twin of ``operators.dedup.decontaminate_spans`` +
    ``remove_duplicate_spans``: every arriving training doc has its
    eval-verbatim character spans located and CUT the moment its
    micro-batch lands (the span-level r7 extension of
    :func:`streaming_contamination_check`'s doc-level report).

    Batch-equal by construction: a doc's spans depend only on its own
    grams vs the static eval side — no cross-doc, no cross-batch state —
    so any batch split replays to identical cleaned text."""
    from ..operators.dedup import decontaminate_spans, remove_duplicate_spans

    def per_batch(b: DataFrame) -> DataFrame:
        spans = decontaminate_spans(
            b, eval_df, k=k, text_col=text_col, id_col=id_col
        )
        return remove_duplicate_spans(
            b, spans, text_col=text_col, id_col=id_col
        )

    return foreach_batch_apply(stream, per_batch, out_path, checkpoint_path)


def stream_stream_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    within_s: int = 3600,
    watermark_s: int = 7200,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Stream-stream event-time interval join: attribute every purchase
    to the clicks of the same user in the preceding ``within_s`` seconds
    — the canonical ad-attribution / funnel-stitching shape.

    Both sides carry event-time watermarks (``watermark_s``), so Spark
    bounds the join state: a click older than the watermark plus the
    join interval can never match a future purchase and is evicted
    (state is O(recent events), not O(stream)).  The join condition is
    an equi-key plus a time RANGE — Spark requires exactly this shape to
    derive state-cleanup predicates for stream-stream joins.

    Append mode; each (click, purchase) pair emits once, when both sides
    have arrived and the watermark allows.
    """
    c = (
        clicks.withWatermark(ts_col, f"{watermark_s} seconds")
        .select(
            F.col(key_col).alias("user_id"),
            F.col(ts_col).alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
    )
    p = (
        purchases.withWatermark(ts_col, f"{watermark_s} seconds")
        .select(
            F.col(key_col).alias("p_user_id"),
            F.col(ts_col).alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
    )
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {within_s} SECONDS")
        ),
        "inner",
    ).select(
        "user_id", "click_id", "click_ts", "purchase_id", "purchase_ts",
        "purchase_value",
    )


def streaming_quarantine(
    stream: DataFrame,
    rules,
    clean_path: str,
    quarantine_path: str,
    checkpoint_path: str,
    available_now: bool = True,
):
    """Streaming expectations gate: every micro-batch splits through
    ``operators.dq.quarantine_split`` — clean rows append to the main
    table, failing rows (with their ``dq_failures`` attribution) to the
    quarantine table.  One scan per batch, no shuffle; the standard
    lakehouse ingest-gate flow, online."""
    from ..operators.dq import quarantine_split

    def run(batch_df: DataFrame, _epoch: int) -> None:
        clean, bad = quarantine_split(batch_df, rules)
        # per-epoch overwrite directories = idempotent retries (see
        # foreach_batch_apply)
        clean.write.mode("overwrite").parquet(
            os.path.join(clean_path, f"batch_epoch={_epoch}")
        )
        bad.write.mode("overwrite").parquet(
            os.path.join(quarantine_path, f"batch_epoch={_epoch}")
        )

    writer = (
        stream.writeStream.foreachBatch(run)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_scd2(
    updates_stream: DataFrame,
    history_path: str,
    checkpoint_path: str,
    keys: list[str],
    attrs: list[str],
    ts_col: str = "ts",
    available_now: bool = True,
):
    """Online SCD-2: each micro-batch of updates folds into the
    validity-interval history table via ``operators.merge.scd2_apply``
    (after ``cdc_latest`` compaction within the batch — the unique-key
    contract).

    Cost model: plain parquet has no MERGE, so for a PLAIN history dir
    each batch read-modify-WRITES the whole table (staged to a temp dir,
    then swapped — the epoch-id makes retries idempotent).  That is the
    correct shape for dimension-sized histories (millions of rows).  For
    fact-sized histories, lay the table out with
    ``operators.merge.scd2_write_bucketed`` first: the sidecar is
    auto-detected here and each batch then runs the bucket-PRUNED merge
    (``scd2_apply_bucketed``) — only bucket directories containing
    updated keys are read or rewritten."""
    import os
    import shutil

    from ..operators.merge import (
        cdc_latest,
        scd2_apply,
        scd2_apply_bucketed,
    )

    bak = history_path + ".__prev"

    def run(batch_df: DataFrame, _epoch: int) -> None:
        spark = batch_df.sparkSession
        if os.path.exists(os.path.join(history_path, "_scd2_buckets.json")):
            compacted = cdc_latest(batch_df, keys, ts_col=ts_col)
            scd2_apply_bucketed(
                spark, history_path, compacted, attrs, ts_col=ts_col
            )
            return
        # crash recovery: a previous attempt that died mid-swap left the
        # real history parked at .__prev — restore before reading (the
        # rename pair below guarantees at most one of the two exists
        # fully, and .__prev is only removed after the new history is in
        # place)
        if not os.path.exists(history_path) and os.path.exists(bak):
            os.rename(bak, history_path)
        compacted = cdc_latest(batch_df, keys, ts_col=ts_col)
        if os.path.exists(history_path):
            hist = spark.read.parquet(history_path)
        else:
            hist = (
                compacted.select(
                    *keys,
                    *attrs,
                    F.col(ts_col).alias("valid_from"),
                )
                .limit(0)
                .withColumn("valid_to", F.lit(None).cast("timestamp"))
            )
        merged = scd2_apply(hist, compacted, keys, attrs, ts_col=ts_col)
        tmp = history_path + f".__epoch_{_epoch}"
        merged.write.mode("overwrite").parquet(tmp)
        # swap via RENAMES only (no delete-then-rename window): park the
        # old history aside, move the new one in, then drop the parked
        # copy — a crash at any point leaves a recoverable state
        shutil.rmtree(bak, ignore_errors=True)
        if os.path.exists(history_path):
            os.rename(history_path, bak)
        os.rename(tmp, history_path)
        shutil.rmtree(bak, ignore_errors=True)
        spark.catalog.refreshByPath(history_path)

    writer = (
        updates_stream.writeStream.foreachBatch(run)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
