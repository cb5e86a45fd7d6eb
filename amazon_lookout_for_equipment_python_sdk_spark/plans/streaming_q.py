"""Driver-visible streaming rows (r8): registered batch queries whose
Spark side actually executes the STREAMING code path — readStream +
foreachBatch replay through ``streaming.pipeline`` — and whose final
table is SQL-expressible, so the DuckDB oracle checks the strongest
claim the streaming layer makes: stream-replay == batch fold.

The pytest suite pins stream==batch equivalence per operator
(test_streaming_pipeline.py); this module makes one such equivalence
oracle-checkable by the driver every round."""

from __future__ import annotations

import hashlib
import os
import re
import shutil
import tempfile

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import load, register


#: state partitions for the stateful top-k replay: the feed has exactly
#: 5 groups (event_type values) and O(capacity) state per group, so the
#: session default (shuffle partitions = cores) would spin up and commit
#: cores-many state stores per micro-batch with all but 5 of them empty
#: — pure machinery overhead at ANY scale (each state store writes a
#: delta file per batch even when empty).  Sized to group cardinality
#: plus headroom, NOT to the local core count; r15 A/B (min-of-4,
#: sf0.1): 32 partitions 3.30s vs 8 partitions 2.46s per invocation.
_TOPK_STATE_PARTITIONS = 8


@contextmanager
def _shuffle_partitions(spark: SparkSession, n: int):
    """Pin ``spark.sql.shuffle.partitions`` while a streaming query runs.

    Structured Streaming fixes the STATE partition count from this conf
    at first-checkpoint creation; sizing it to the operator's group
    cardinality is a per-query deployment decision, so it cannot live in
    the session factory.  Restores the previous value on exit."""
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _work_dir(name: str, sf_dir: str) -> str:
    """Deterministic per-(query, fixture, process, thread) work root
    (r8 verdict #4; hardened r10 per ADVICE): the returned frame is
    lazy over the final history/snapshot parquet, so the CURRENT run's
    dir must outlive this function.  The r9 shape — one shared dir
    wiped on entry — let CONCURRENT invocations (parallel test
    runners, a bench run overlapping a driver run) delete each other's
    live feed/checkpoint mid-use.  Now each (process, thread) owns a
    ``pid<N>t<M>`` subdir of the deterministic base: live owners never
    touch each other's dirs, and on entry we reap (a) our own previous
    subdir (its frames are dead by the documented consume-before-
    reinvoke contract), (b) any subdir whose owning pid no longer
    exists, and (c) our own process's subdirs whose owning thread has
    finished — so TMPDIR residue is bounded at one fixture-sized dir
    per (query, fixture) per LIVE invoking thread, with dead-owner
    residue collected by the next caller.

    Two scope notes (r10 ADVICE).  The consume-before-reinvoke contract
    binds the WHOLE PROCESS, not the invoking thread: the reaper treats
    a finished producer thread's dir as dead even if another thread
    still holds that invocation's un-consumed lazy frame (thread
    liveness comes from ``threading.enumerate()``, which only sees
    threading-managed threads anyway) — consume the frame before ANY
    thread of the process re-invokes the same (query, fixture).  And
    the cross-process existence probe (``os.kill(pid, 0)``) is
    POSIX-only — on other platforms ``os.kill`` can TERMINATE the
    probed process, so foreign-pid reaping is skipped there entirely
    (dead foreign dirs then persist until a POSIX caller or TMPDIR
    cleaning collects them; this engine's test/bench hosts are POSIX)."""
    import threading

    digest = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    base = os.path.join(
        tempfile.gettempdir(), f"sparkgraft_{name}_{digest}"
    )
    os.makedirs(base, exist_ok=True)
    me = os.getpid()
    my_tid = threading.get_native_id()
    live_tids = {
        t.native_id for t in threading.enumerate() if t.native_id
    }
    for entry in os.listdir(base):
        m = re.fullmatch(r"pid(\d+)t(\d+)", entry)
        if not m:
            continue
        pid, tid = int(m.group(1)), int(m.group(2))
        if pid != me:
            if os.name != "posix":
                continue  # kill(0) is not an existence probe elsewhere
            try:
                os.kill(pid, 0)  # signal 0: existence probe only
                continue  # owner process alive — leave its dir alone
            except ProcessLookupError:
                pass  # dead owner — stale residue, reap it
            except PermissionError:
                continue  # exists under another uid — treat as alive
        elif tid != my_tid and tid in live_tids:
            continue  # live sibling thread's dir — leave it alone
        # own previous dir (frames dead by the consume-before-reinvoke
        # contract), a finished sibling thread's, or a dead process's
        shutil.rmtree(os.path.join(base, entry), ignore_errors=True)
    work = os.path.join(base, f"pid{me}t{my_tid}")
    os.makedirs(work)
    return work

# The oracle folds the SAME two-epoch replay in SQL: each epoch
# contributes its per-key LATEST update (streaming_scd2 runs cdc_latest
# per micro-batch — the unique-key contract), then the epoch-0 and
# epoch-1 versions full-join per key and expand by the scd2_apply rule:
# attribute change -> close (valid_to = new ts) + open; no change ->
# current row survives; key seen in only one epoch -> single current row.
# The feed is monotone across epochs by construction (the cut is a
# timestamp boundary), so the stale-drop branch is vacuous here.
_SCD2_REPLAY_SQL = """
WITH u AS (
  SELECT o_custkey AS k, o_orderstatus AS attr,
         o_orderdate + to_microseconds(o_orderkey) AS ts
  FROM orders WHERE o_orderkey % 3 = 0
), tagged AS (
  SELECT k, attr, ts,
         CASE WHEN ts < TIMESTAMP '1995-07-01' THEN 0 ELSE 1 END AS ep
  FROM u
), latest AS (
  SELECT k, attr, ts, ep FROM (
    SELECT k, attr, ts, ep,
           row_number() OVER (PARTITION BY k, ep ORDER BY ts DESC) AS rn
    FROM tagged) t
  WHERE rn = 1
), e0 AS (SELECT k, attr, ts FROM latest WHERE ep = 0),
   e1 AS (SELECT k, attr, ts FROM latest WHERE ep = 1),
   j AS (
  SELECT coalesce(e0.k, e1.k) AS k,
         e0.attr AS a0, e0.ts AS t0, e1.attr AS a1, e1.ts AS t1
  FROM e0 FULL JOIN e1 ON e0.k = e1.k
)
SELECT k, a0 AS attr, t0 AS valid_from, t1 AS valid_to
FROM j WHERE a0 IS NOT NULL AND a1 IS NOT NULL AND a0 IS DISTINCT FROM a1
UNION ALL
SELECT k, a1 AS attr, t1 AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
FROM j WHERE a1 IS NOT NULL AND (a0 IS NULL OR a0 IS DISTINCT FROM a1)
UNION ALL
SELECT k, a0 AS attr, t0 AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
FROM j WHERE a0 IS NOT NULL AND (a1 IS NULL OR a0 IS NOT DISTINCT FROM a1)
"""


@register("streaming_scd2_replay", _SCD2_REPLAY_SQL)
def streaming_scd2_replay_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-epoch Structured Streaming replay of an SCD-2 changelog,
    driven end-to-end through ``streaming.pipeline.streaming_scd2``
    (readStream file source -> availableNow trigger -> foreachBatch
    cdc_latest + scd2_apply -> history swap), returning the FINAL
    history table the stream produced.

    Fixture: a deterministic changelog derived from orders — key =
    o_custkey, tracked attribute = o_orderstatus, ts = o_orderdate plus
    o_orderkey microseconds (globally unique, so per-key latest is
    well-defined on both engines).  Epoch 0 holds every update before
    1995-07-01, epoch 1 the rest: the first availableNow run folds epoch
    0 into an empty history; the second run (SAME checkpoint — the file
    source's seen-files log is what scopes it to the new files) folds
    epoch 1 on top.  Monotone across epochs by construction.

    This is the one registered query whose Spark side runs the streaming
    machinery — checkpointing, epoch accounting, the read-modify-swap
    history writer — so the driver's oracle row certifies stream-replay
    == SQL fold, not just the batch operator."""
    from ..streaming.pipeline import streaming_scd2

    orders = load(spark, sf_dir, "orders")
    u = orders.filter((F.col("o_orderkey") % 3) == 0).select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderstatus").alias("attr"),
        F.timestamp_micros(
            F.unix_micros(F.col("o_orderdate")) + F.col("o_orderkey")
        ).alias("ts"),
    )
    cut = F.to_timestamp(F.lit("1995-07-01"))

    work = _work_dir("scd2_replay", sf_dir)
    upd_dir = os.path.join(work, "updates")
    hist_path = os.path.join(work, "history")
    ckpt = os.path.join(work, "ckpt")

    u.filter(F.col("ts") < cut).write.parquet(upd_dir)
    for epoch_feed in (None, u.filter(F.col("ts") >= cut)):
        if epoch_feed is not None:
            # drop epoch-1 files next to epoch 0's: the checkpoint's
            # seen-files log makes the second run process ONLY these
            epoch_feed.write.mode("append").parquet(upd_dir)
        stream = spark.readStream.schema(u.schema).parquet(upd_dir)
        q = streaming_scd2(
            stream, hist_path, ckpt, keys=["k"], attrs=["attr"]
        )
        q.awaitTermination()

    # the oracle folds each epoch's per-key LATEST, i.e. it models each
    # epoch as exactly ONE micro-batch (cdc_latest compacts per batch).
    # availableNow with no read limits does run one batch per epoch, but
    # a session that sets maxFilesPerTrigger would split the files and a
    # within-epoch attr change would emit a close+open the oracle does
    # not model — assert the batch count (one offsets file per batch)
    # so the assumption breaks LOUDLY, not as a silent hash mismatch
    n_batches = len(
        [f for f in os.listdir(os.path.join(ckpt, "offsets"))
         if not f.startswith(".")]
    )
    if n_batches != 2:
        # a runtime contract in a registered query, NOT an assert: under
        # ``python -O`` an assert is stripped and a read-limit config
        # would surface only as an opaque oracle hash mismatch (ADVICE r8)
        raise RuntimeError(
            f"expected 1 micro-batch per epoch, checkpoint shows "
            f"{n_batches}; a read-limit config (maxFilesPerTrigger?) "
            "broke the oracle's one-batch-per-epoch contract"
        )
    # the returned frame reads only the final history: drop the replay
    # feed + checkpoint so repeated bench/driver invocations don't
    # accumulate the fixture-sized bytes in TMPDIR (the history table
    # itself must stay — the lazy result reads it)
    shutil.rmtree(upd_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.read.parquet(hist_path).select(
        "k", "attr", "valid_from", "valid_to"
    )


# The oracle is plain exact counting: under capacity (97 distinct tokens
# vs 256 counters) Space-Saving NEVER evicts, so its estimates are exact,
# order-independent, and err = 0 on every row — the streaming snapshot
# after the last batch equals the batch top-k of the whole stream.
_TOPK_REPLAY_SQL = """
WITH toks AS (
  SELECT event_type AS grp, CAST(user_id % 97 AS VARCHAR) AS token
  FROM events WHERE event_id % 5 = 0
), counts AS (
  SELECT grp, token, CAST(count(*) AS BIGINT) AS est
  FROM toks GROUP BY 1, 2
)
SELECT grp, token, est, CAST(0 AS BIGINT) AS err FROM (
  SELECT grp, token, est,
         row_number() OVER (PARTITION BY grp ORDER BY est DESC, token) AS rn
  FROM counts) t
WHERE rn <= 10
"""


@register("streaming_topk_replay", _TOPK_REPLAY_SQL)
def streaming_topk_replay_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-epoch replay through the STATEFUL streaming machinery
    (``applyInPandasWithState``): the events table, split in half by
    event_id parity, feeds ``streaming_topk_tokens`` (Space-Saving heavy
    hitters, Metwally 2005) across two availableNow runs sharing a
    checkpoint; each group's LATEST top-10 snapshot is returned (a group
    absent from later epochs received no new data, so its latest
    snapshot already equals the full-stream counts) and oracle-checked
    against exact SQL counts.

    Under capacity the sketch is exact and ORDER-INDEPENDENT (no
    eviction ever fires: 97 distinct tokens vs 256 counters, at any SF
    since the token is user_id mod 97), which is what makes an
    arbitrary-state streaming operator driver-hash-checkable — the
    companion row to ``streaming_scd2_replay``'s foreachBatch path: that
    one certifies the epoch-swap sink machinery, this one certifies
    checkpointed GroupState carried ACROSS streaming queries.  err = 0
    on every row pins that no eviction (and thus no order dependence)
    occurred."""
    from ..streaming.pipeline import foreach_batch_apply
    from ..streaming.stateful import streaming_topk_tokens

    # a 1-in-5 deterministic sample: the row certifies the stateful
    # MACHINERY (state codecs, checkpoint recovery, cross-query carry),
    # which is volume-independent — no reason to ship the whole fact
    # table through Python twice per invocation
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 5 == 0).select(
        F.col("event_id"),
        F.col("event_type").alias("grp"),
        (F.col("user_id") % 97).cast("string").alias("token"),
    )

    work = _work_dir("topk_replay", sf_dir)
    feed = os.path.join(work, "feed")
    out = os.path.join(work, "snapshots")
    ckpt = os.path.join(work, "ckpt")

    ev.filter(F.col("event_id") % 2 == 0).select("grp", "token").write.parquet(
        feed
    )
    for epoch_feed in (None, ev.filter(F.col("event_id") % 2 == 1)):
        if epoch_feed is not None:
            epoch_feed.select("grp", "token").write.mode("append").parquet(feed)
        stream = spark.readStream.schema("grp string, token string").parquet(
            feed
        )
        snap = streaming_topk_tokens(stream, capacity=256, k=10)
        # state partitions sized to the 5-group feed (_TOPK_STATE_PARTITIONS
        # doc) — partitioning changes machinery only; the sketch is exact
        # and order-independent under capacity, so rows/hash are unchanged
        with _shuffle_partitions(spark, _TOPK_STATE_PARTITIONS):
            q = foreach_batch_apply(snap, lambda b: b, out, ckpt)
            q.awaitTermination()

    shutil.rmtree(feed, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    snaps = spark.read.parquet(out)
    # take each GROUP's latest snapshot, not the last batch's (r8 review):
    # applyInPandasWithState only emits for groups present in a batch, so
    # a group with no epoch-1 rows would vanish from a global-last filter
    # while the oracle still counts it.  A group absent from later epochs
    # received no new data, so its latest snapshot already equals the
    # full-stream counts — per-group latest is ALWAYS the final state.
    w = Window.partitionBy("grp")
    return (
        snaps.withColumn("_last", F.max("batch_epoch").over(w))
        .filter(F.col("batch_epoch") == F.col("_last"))
        .select("grp", "token", "est", "err")
    )
