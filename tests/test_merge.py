"""MERGE / CDC operators (operators/merge.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.operators.merge import (
    cdc_latest,
    merge_upsert,
)


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double",
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, s string, v double"
    )
    got = sorted(
        (r["k"], r["s"], r["v"])
        for r in merge_upsert(target, updates, ["k"]).collect()
    )
    assert got == [(1, "a", 10.0), (2, "B", 99.0), (3, "c", 30.0), (4, "d", 40.0)]


def test_merge_upsert_composite_key(spark):
    target = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0)], "k long, s string, v double"
    )
    updates = spark.createDataFrame([(1, "y", 9.0)], "k long, s string, v double")
    got = sorted(
        (r["k"], r["s"], r["v"])
        for r in merge_upsert(target, updates, ["k", "s"]).collect()
    )
    assert got == [(1, "x", 1.0), (1, "y", 9.0)]


def test_cdc_latest_picks_newest_with_tiebreak(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 5, 1.0),
        (1, "2024-01-02 00:00:00", 6, 2.0),  # newest ts
        (1, "2024-01-02 00:00:00", 7, 3.0),  # same ts, higher tiebreak wins
        (2, "2024-01-01 00:00:00", 8, 4.0),
    ]
    df = spark.createDataFrame(
        rows, "k long, ts_s string, event_id long, v double"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    got = {
        r["k"]: (r["event_id"], r["v"])
        for r in cdc_latest(df, ["k"], tiebreak_col="event_id").collect()
    }
    assert got == {1: (7, 3.0), 2: (8, 4.0)}


def test_cdc_latest_plans_window_group_limit(spark):
    """Scale shape: rank-1 must compile to WindowGroupLimit so map tasks
    pre-prune history before the shuffle."""
    df = spark.createDataFrame(
        [(1, i, float(i)) for i in range(100)], "k long, event_id long, v double"
    ).withColumn("ts", F.timestamp_seconds(F.col("event_id")))
    plan = (
        cdc_latest(df, ["k"], tiebreak_col="event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan


def _scd2_frames(spark):
    from pyspark.sql import functions as F

    hist = spark.createDataFrame(
        [
            # key 1: one closed version + one current
            (1, "a", "2024-01-01 00:00:00", "2024-02-01 00:00:00"),
            (1, "b", "2024-02-01 00:00:00", None),
            # key 2: current only
            (2, "x", "2024-01-15 00:00:00", None),
            # key 3: current only, update won't change it
            (3, "z", "2024-01-20 00:00:00", None),
        ],
        "k long, attr string, vf_s string, vt_s string",
    ).select(
        "k", "attr",
        F.to_timestamp("vf_s").alias("valid_from"),
        F.to_timestamp("vt_s").alias("valid_to"),
    )
    upd = spark.createDataFrame(
        [
            (1, "c", "2024-03-01 00:00:00"),   # change -> close + open
            (3, "z", "2024-03-01 00:00:00"),   # no change -> dropped
            (4, "new", "2024-03-01 00:00:00"), # new key -> insert
        ],
        "k long, attr string, ts_s string",
    ).select("k", "attr", F.to_timestamp("ts_s").alias("ts"))
    return hist, upd


def test_scd2_apply_semantics(spark):
    from amazon_lookout_for_equipment_python_sdk_spark.operators.merge import (
        scd2_apply,
    )

    hist, upd = _scd2_frames(spark)
    out = scd2_apply(hist, upd, ["k"], ["attr"])
    rows = sorted(
        (r["k"], r["attr"], str(r["valid_from"]), str(r["valid_to"]))
        for r in out.collect()
    )
    assert rows == [
        (1, "a", "2024-01-01 00:00:00", "2024-02-01 00:00:00"),  # untouched
        (1, "b", "2024-02-01 00:00:00", "2024-03-01 00:00:00"),  # closed
        (1, "c", "2024-03-01 00:00:00", "None"),                 # opened
        (2, "x", "2024-01-15 00:00:00", "None"),                 # kept
        (3, "z", "2024-01-20 00:00:00", "None"),                 # no-change
        (4, "new", "2024-03-01 00:00:00", "None"),               # inserted
    ]


def test_scd2_apply_is_idempotent_for_unchanged_feed(spark):
    from amazon_lookout_for_equipment_python_sdk_spark.operators.merge import (
        scd2_apply,
    )

    hist, upd = _scd2_frames(spark)
    once = scd2_apply(hist, upd, ["k"], ["attr"])
    twice = scd2_apply(once, upd, ["k"], ["attr"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_scd2_single_join_plan(spark):
    """The candidate-array expansion must keep ONE join (no per-branch
    refilter recomputing it)."""
    from amazon_lookout_for_equipment_python_sdk_spark.operators.merge import (
        scd2_apply,
    )

    hist, upd = _scd2_frames(spark)
    plan = (
        scd2_apply(hist, upd, ["k"], ["attr"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("SortMergeJoin") + plan.count("HashJoin") == 1, plan


def test_scd2_apply_drops_stale_out_of_order_update(spark):
    """A cross-batch late update (ts earlier than the current row's
    valid_from) must NOT close the row with an inverted interval — the
    monotone-feed contract drops it and the current row survives."""
    from pyspark.sql import functions as F

    from amazon_lookout_for_equipment_python_sdk_spark.operators.merge import (
        scd2_apply,
    )

    hist = spark.createDataFrame(
        [(1, "b", "2024-02-01 00:00:00", None)],
        "k long, attr string, vf_s string, vt_s string",
    ).select(
        "k", "attr",
        F.to_timestamp("vf_s").alias("valid_from"),
        F.to_timestamp("vt_s").alias("valid_to"),
    )
    late = spark.createDataFrame(
        [(1, "old", "2024-01-10 00:00:00")], "k long, attr string, ts_s string"
    ).select("k", "attr", F.to_timestamp("ts_s").alias("ts"))
    out = scd2_apply(hist, late, ["k"], ["attr"]).collect()
    assert [(r["k"], r["attr"], str(r["valid_from"]), r["valid_to"]) for r in out] == [
        (1, "b", "2024-02-01 00:00:00", None)
    ]
    # and no row anywhere may carry valid_to < valid_from
    bad = [
        r for r in out
        if r["valid_to"] is not None and r["valid_to"] < r["valid_from"]
    ]
    assert not bad


def test_scd2_apply_bucketed_rewrites_only_touched_buckets(spark, tmp_path):
    """Fact-scale SCD-2: a merge touching one key must leave every
    untouched bucket directory byte-identical (content AND mtime — the
    files were never rewritten), rewrite only the touched bucket, and
    produce exactly the rows whole-table scd2_apply would."""
    import os

    from pyspark.sql import functions as F

    from amazon_lookout_for_equipment_python_sdk_spark.operators.merge import (
        scd2_apply,
        scd2_apply_bucketed,
        scd2_write_bucketed,
    )

    path = str(tmp_path / "hist")
    hist = (
        spark.range(200)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("attr"),
            F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
        )
    )
    scd2_write_bucketed(hist, path, ["k"], n_buckets=8)

    def snapshot():
        out = {}
        for root, _dirs, files in os.walk(path):
            for f in files:
                p = os.path.join(root, f)
                out[os.path.relpath(p, path)] = (
                    os.path.getsize(p),
                    os.path.getmtime(p),
                    open(p, "rb").read() if p.endswith(".parquet") else b"",
                )
        return out

    before = snapshot()
    upd = spark.createDataFrame(
        [(7, "CHANGED", "2024-02-01 00:00:00")],
        "k long, attr string, ts_s string",
    ).select("k", "attr", F.to_timestamp("ts_s").alias("ts"))
    stats = scd2_apply_bucketed(spark, path, upd, ["attr"])
    assert stats["touched_buckets"] == 1 and stats["total_buckets"] == 8

    after = snapshot()
    from amazon_lookout_for_equipment_python_sdk_spark.operators.merge import (
        _bucket_expr,
    )

    touched = upd.select(_bucket_expr(["k"], 8).alias("b")).first().b
    changed_files = {
        f
        for f in set(before) | set(after)
        if before.get(f) != after.get(f)
    }
    for f in changed_files:
        assert f.startswith(f"_bucket={touched}") or f.startswith("_"), f
    untouched_before = {
        f: v for f, v in before.items() if f.startswith("_bucket=")
        and not f.startswith(f"_bucket={touched}")
    }
    assert untouched_before  # the test is vacuous without them
    for f, v in untouched_before.items():
        assert after[f] == v, f"untouched bucket file rewritten: {f}"

    # row-level equivalence with the whole-table merge
    expect = sorted(
        (r.k, r.attr, str(r.valid_from), str(r.valid_to))
        for r in scd2_apply(hist, upd, ["k"], ["attr"]).collect()
    )
    got = sorted(
        (r.k, r.attr, str(r.valid_from), str(r.valid_to))
        for r in spark.read.parquet(path).drop("_bucket").collect()
    )
    assert got == expect
    # second merge with NO updates is a no-op
    empty = upd.limit(0)
    stats2 = scd2_apply_bucketed(spark, path, empty, ["attr"])
    assert stats2["touched_buckets"] == 0


def test_scd2_apply_bucketed_recovers_parked_bucket(spark, tmp_path):
    """A crash between parking a bucket dir and landing its replacement
    leaves `_bucket=N.__prev`; the next merge must restore it before
    reading."""
    import os

    from pyspark.sql import functions as F

    from amazon_lookout_for_equipment_python_sdk_spark.operators.merge import (
        scd2_apply_bucketed,
        scd2_write_bucketed,
    )

    path = str(tmp_path / "hist")
    hist = spark.range(50).select(
        F.col("id").alias("k"),
        F.lit("x").alias("attr"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    scd2_write_bucketed(hist, path, ["k"], n_buckets=4)
    # simulate the crash window: one bucket parked, replacement missing
    victim = next(
        d for d in os.listdir(path) if d.startswith("_bucket=")
    )
    os.rename(os.path.join(path, victim), os.path.join(path, victim + ".__prev"))
    upd = spark.createDataFrame(
        [(1, "y", "2024-02-01 00:00:00")], "k long, attr string, ts_s string"
    ).select("k", "attr", F.to_timestamp("ts_s").alias("ts"))
    scd2_apply_bucketed(spark, path, upd, ["attr"])
    rows = spark.read.parquet(path)
    assert rows.filter(F.col("valid_to").isNull()).count() == 50  # no loss
    assert not any(d.endswith(".__prev") for d in os.listdir(path))


def test_scd2_apply_bucketed_creates_new_bucket_for_new_key(spark, tmp_path):
    """An update for a key whose hash bucket has no directory yet (tiny
    seeded history) must create the bucket dir and insert the row."""
    import os

    from pyspark.sql import functions as F

    from amazon_lookout_for_equipment_python_sdk_spark.operators.merge import (
        _bucket_expr,
        scd2_apply_bucketed,
        scd2_write_bucketed,
    )

    path = str(tmp_path / "hist")
    hist = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00", None)],
        "k long, attr string, vf_s string, vt_s string",
    ).select(
        "k", "attr",
        F.to_timestamp("vf_s").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    scd2_write_bucketed(hist, path, ["k"], n_buckets=16)
    # find a key landing in a bucket with no directory yet
    existing = {
        int(d.split("=")[1])
        for d in os.listdir(path)
        if d.startswith("_bucket=")
    }
    probe = spark.createDataFrame(
        [(k,) for k in range(2, 200)], "k long"
    ).select("k", _bucket_expr(["k"], 16).alias("b"))
    new_key = next(
        r["k"] for r in probe.collect() if r["b"] not in existing
    )
    upd = spark.createDataFrame(
        [(new_key, "fresh", "2024-02-01 00:00:00")],
        "k long, attr string, ts_s string",
    ).select("k", "attr", F.to_timestamp("ts_s").alias("ts"))
    stats = scd2_apply_bucketed(spark, path, upd, ["attr"])
    assert stats["touched_buckets"] == 1
    rows = spark.read.parquet(path).collect()
    cur = {(r["k"], r["attr"]) for r in rows if r["valid_to"] is None}
    assert (1, "a") in cur and (new_key, "fresh") in cur and len(cur) == 2


def test_scd2_parks_outside_table_dir_and_recovers(spark, tmp_path):
    """r6 ADVICE: parks must live OUTSIDE the table dir — a name like
    `_bucket=N.__prev` inside it contains '=', so Spark's hidden-path
    filter does NOT skip it and a direct read during the crash window
    sees duplicate rows plus a string-inferred _bucket.  Pin both: (a)
    a crashed swap (live + sibling park both present) stays invisible
    to spark.read.parquet; (b) the next merge restores a missing live
    bucket from the sibling park."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from amazon_lookout_for_equipment_python_sdk_spark.operators.merge import (
        scd2_apply_bucketed,
        scd2_write_bucketed,
    )

    path = str(tmp_path / "hist")
    hist = spark.range(50).select(
        F.col("id").alias("k"),
        F.lit("x").alias("attr"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    scd2_write_bucketed(hist, path, ["k"], n_buckets=4)
    victim = next(d for d in os.listdir(path) if d.startswith("_bucket="))
    prev_root = path + ".__prev"
    os.makedirs(prev_root)
    # (a) crash AFTER landing the new dir but BEFORE dropping the park:
    # both live and park hold data — a direct read must see no dupes
    shutil.copytree(os.path.join(path, victim), os.path.join(prev_root, victim))
    assert spark.read.parquet(path).count() == 50
    # (b) crash BEFORE landing the new dir: live missing, park present —
    # the next merge restores it and loses nothing
    shutil.rmtree(os.path.join(path, victim))
    upd = spark.createDataFrame(
        [(1, "y", "2024-02-01 00:00:00")], "k long, attr string, ts_s string"
    ).select("k", "attr", F.to_timestamp("ts_s").alias("ts"))
    scd2_apply_bucketed(spark, path, upd, ["attr"])
    rows = spark.read.parquet(path)
    assert rows.filter(F.col("valid_to").isNull()).count() == 50
    assert not os.path.exists(prev_root)
