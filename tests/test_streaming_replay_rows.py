"""Driver-visible streaming replay rows (plans/streaming_q.py): the
oracle gate hashes values, so these queries must be bit-deterministic
across invocations — each run builds fresh temp dirs, replays two
epochs, and must land on identical tables."""

from __future__ import annotations

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    df = entrymod.queries()[name](spark, SF)
    return sorted(tuple(r) for r in df.collect())


def test_scd2_replay_deterministic_and_covers_both_epochs(spark):
    a = _rows(spark, "streaming_scd2_replay")
    b = _rows(spark, "streaming_scd2_replay")
    assert a == b and len(a) > 0
    # both epochs contributed: some closed rows (attr changed across the
    # cut) AND some still-open rows exist
    closed = [r for r in a if r[3] is not None]
    current = [r for r in a if r[3] is None]
    assert closed and current


def test_topk_replay_deterministic_exact_no_eviction(spark):
    a = _rows(spark, "streaming_topk_replay")
    b = _rows(spark, "streaming_topk_replay")
    assert a == b and len(a) > 0
    # under-capacity Space-Saving: every row exact, err == 0
    assert all(r[3] == 0 for r in a)


def test_replay_rows_do_not_accumulate_tmpdir_state(spark):
    """r8 verdict #4 / ADVICE: each invocation used to leave a fresh
    mkdtemp root (the lazy result needs the final history/snapshot
    parquet alive) — unbounded across bench/driver/plain-env runs.  Now
    the work root is deterministic per (query, fixture) and wiped on
    entry, so N invocations leave exactly ONE dir per (query, fixture),
    and the leftover holds only the final table (feed + checkpoint
    removed).  Dirs from runs against OTHER fixtures (check.py at
    sf0.01, plain-env sweeps) legitimately coexist — the test clears
    the prefix space first so the count isolates ITS invocations."""
    import glob
    import os
    import shutil
    import tempfile

    tmp = tempfile.gettempdir()

    def dirs(prefix):
        return set(glob.glob(os.path.join(tmp, f"sparkgraft_{prefix}_*")))

    for name, prefix, keep in (
        ("streaming_scd2_replay", "scd2_replay", "history"),
        ("streaming_topk_replay", "topk_replay", "snapshots"),
    ):
        for leftover in dirs(prefix):  # other fixtures' residue
            shutil.rmtree(leftover, ignore_errors=True)
        _rows(spark, name)
        first = dirs(prefix)
        _rows(spark, name)
        second = dirs(prefix)
        assert len(first) == 1 and first == second, (name, first, second)
        # r10: the base dir holds exactly ONE per-(process, thread)
        # subdir (ours)
        import threading

        base = next(iter(second))
        subdirs = sorted(os.listdir(base))
        assert subdirs == [
            f"pid{os.getpid()}t{threading.get_native_id()}"
        ], (name, subdirs)
        leftovers = sorted(os.listdir(os.path.join(base, subdirs[0])))
        assert leftovers == [keep], (name, leftovers)


def test_replay_work_dirs_are_per_process_and_reap_only_dead(spark):
    """r9 ADVICE (medium): the shared wipe-on-entry dir let concurrent
    invocations delete each other's live feed/checkpoint.  Now each
    (process, thread) owns a pid<N>t<M> subdir; on entry a caller reaps
    its OWN previous dir, dirs of DEAD pids, and its own process's
    finished-thread dirs — and must leave a LIVE foreign process's dir
    and a LIVE sibling thread's dir untouched (pid 1 stands in for a
    live foreign process; a guaranteed-unused huge pid for a dead one;
    a sleeping helper thread for a live sibling)."""
    import os
    import threading

    from amazon_lookout_for_equipment_python_sdk_spark.plans.streaming_q import (
        _work_dir,
    )

    sf = SF
    work = _work_dir("racecheck", sf)
    base = os.path.dirname(work)
    me = os.getpid()
    live = os.path.join(base, "pid1t1")  # init: always alive
    os.makedirs(live, exist_ok=True)
    open(os.path.join(live, "sentinel"), "w").close()
    dead = os.path.join(base, "pid999999999t1")  # beyond pid_max
    os.makedirs(dead, exist_ok=True)
    junk = os.path.join(base, "pidnotanint")
    os.makedirs(junk, exist_ok=True)
    gone_thread = os.path.join(base, f"pid{me}t999999998")  # finished tid
    os.makedirs(gone_thread, exist_ok=True)

    release = threading.Event()
    started = threading.Event()
    sibling_holder = []

    def hold():
        sibling_holder.append(threading.get_native_id())
        started.set()
        release.wait(30)

    t = threading.Thread(target=hold, daemon=True)
    t.start()
    started.wait(10)
    sibling = os.path.join(base, f"pid{me}t{sibling_holder[0]}")
    os.makedirs(sibling, exist_ok=True)
    try:
        work2 = _work_dir("racecheck", sf)
    finally:
        release.set()
        t.join(10)
    assert work2 == work  # deterministic per (query, fixture, pid, tid)
    entries = set(os.listdir(base))
    assert os.path.basename(live) in entries, entries  # live proc: kept
    assert os.path.exists(os.path.join(live, "sentinel"))
    assert os.path.basename(sibling) in entries, entries  # live thread
    assert os.path.basename(dead) not in entries, entries  # dead: reaped
    assert os.path.basename(gone_thread) not in entries, entries
    assert os.path.basename(junk) in entries, entries  # unparseable: kept

    import shutil

    shutil.rmtree(base, ignore_errors=True)
