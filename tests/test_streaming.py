"""Streaming scheduler tests: slot math properties, file contract,
end-to-end micro-batch scoring with availableNow, replay generator."""

from __future__ import annotations

import glob
import json
import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.streaming import (
    InferenceScheduler,
    SchedulerConfig,
    build_inspection_report,
    expected_filenames,
    export_report_to_html,
    generate_replay_data,
    next_wakeup,
    slot_bounds_for,
)


def test_slot_math_properties():
    # reference scheduler.py:153-164: floor to frequency, end = start+freq-1s
    ts = datetime(2024, 1, 1, 10, 17, 42, 123456)
    start, end = slot_bounds_for(ts, 5)
    assert start == datetime(2024, 1, 1, 10, 15, 0)
    assert end == datetime(2024, 1, 1, 10, 19, 59)
    assert start <= ts <= end
    # every instant lands in exactly one slot
    s2, e2 = slot_bounds_for(end, 5)
    assert (s2, e2) == (start, end)
    s3, _ = slot_bounds_for(datetime(2024, 1, 1, 10, 20, 0), 5)
    assert s3 == datetime(2024, 1, 1, 10, 20, 0)
    assert next_wakeup(ts, 5) == datetime(2024, 1, 1, 10, 20, 0)
    assert next_wakeup(datetime(2024, 1, 1, 10, 20, 0), 5) == datetime(
        2024, 1, 1, 10, 25, 0
    )


def test_expected_filenames_formats():
    slot = datetime(2024, 1, 1, 10, 15, 0)
    assert expected_filenames(["pump", "motor"], slot) == [
        "motor_20240101101500.csv",
        "pump_20240101101500.csv",
    ]
    assert expected_filenames(["pump"], slot, fmt="yyyy-MM-dd-HH-mm-ss") == [
        "pump_2024-01-01-10-15-00.csv"
    ]
    epoch = expected_filenames(["pump"], slot, fmt="EPOCH")[0]
    assert epoch == f"pump_{int(slot.timestamp())}.csv"


def test_frequency_validation():
    cfg = SchedulerConfig(
        scheduler_name="s", input_dir="/tmp/x", output_dir="/tmp/y",
        components=["c"], tags=["t"], frequency="PT7M",
    )
    with pytest.raises(ValueError, match="frequency"):
        _ = cfg.frequency_minutes


def _write_slot_csv(path: str, rows: list[tuple[str, float, float]]):
    with open(path, "w") as f:
        f.write("Timestamp,p1,p2\n")
        for ts, a, b in rows:
            f.write(f"{ts},{a},{b}\n")


def test_scheduler_end_to_end(spark, tmp_path):
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    # two slots for component 'pump'; second file contains one out-of-slot
    # row that the ST4 event-time filter must drop
    _write_slot_csv(
        str(indir / "pump_20240101100000.csv"),
        [
            ("2024-01-01T10:00:30.000000", 1.0, 2.0),
            ("2024-01-01T10:04:59.000000", 1.1, 2.1),
        ],
    )
    _write_slot_csv(
        str(indir / "pump_20240101100500.csv"),
        [
            ("2024-01-01T10:05:10.000000", 1.2, 2.2),
            ("2024-01-01T10:30:00.000000", 9.9, 9.9),  # outside slot -> dropped
        ],
    )

    def score_fn(batch):
        return batch.select(
            F.col("Timestamp").alias("timestamp"),
            F.when(F.col("p1") > 1.05, 1).otherwise(0).alias("prediction"),
            F.lit(0.5).alias("anomaly_score"),
            F.when(
                F.col("p1") > 1.05,
                F.array(
                    F.struct(F.lit("pump\\p1").alias("name"), F.lit(0.6).alias("value")),
                    F.struct(F.lit("pump\\p2").alias("name"), F.lit(0.4).alias("value")),
                ),
            ).alias("diagnostics"),
        )

    cfg = SchedulerConfig(
        scheduler_name="sched1",
        input_dir=str(indir),
        output_dir=str(outdir),
        components=["pump"],
        tags=["p1", "p2"],
        frequency="PT5M",
    )
    sched = InferenceScheduler(spark, cfg, score_fn)
    with pytest.raises(RuntimeError, match="create"):
        sched.start()
    sched.create()
    assert cfg.status == "STOPPED"
    sched.start(available_now=True)
    sched.await_termination()
    sched.stop()

    outs = sorted(glob.glob(str(outdir / "results_*.jsonl")))
    assert [os.path.basename(p) for p in outs] == [
        "results_20240101100000.jsonl",
        "results_20240101100500.jsonl",
    ]
    recs0 = [json.loads(line) for line in open(outs[0])]
    assert len(recs0) == 2
    preds0 = {r["timestamp"]: r["prediction"] for r in recs0}
    assert preds0["2024-01-01 10:00:30"] == 0
    assert preds0["2024-01-01 10:04:59"] == 1
    # diagnostics only on prediction==1 (scheduler.py:647-650)
    for r in recs0:
        assert ("diagnostics" in r) == (r["prediction"] == 1)
    # slot 2: out-of-slot row dropped -> exactly 1 scored record
    recs1 = [json.loads(line) for line in open(outs[1])]
    assert len(recs1) == 1

    execs = sched.list_inference_executions().orderBy("slot_start").collect()
    assert [e["status"] for e in execs] == ["SUCCESS", "SUCCESS"]
    assert [e["n_scored"] for e in execs] == [2, 1]
    only_window = sched.list_inference_executions(
        start_time=datetime(2024, 1, 1, 10, 5)
    ).collect()
    assert len(only_window) == 1

    # ST7: delete requires STOPPED (scheduler.py:504-510)
    sched.delete()
    assert cfg.status == "NOT_CREATED"


def _simple_score_fn(batch):
    return batch.select(
        F.col("Timestamp").alias("timestamp"),
        F.lit(0).alias("prediction"),
        F.lit(0.5).alias("anomaly_score"),
    )


def test_scheduler_tz_offset_and_dash_delimiter(spark, tmp_path):
    """F3 + delimiter escaping: file stamps are wall-time at
    InputTimeZoneOffset +02:00, so stamp 12:00 = slot 10:00 UTC; a '-'
    delimiter with the yyyy-MM-dd-HH-mm-ss format must parse cleanly."""
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    _write_slot_csv(
        str(indir / "pump-2024-01-01-12-00-00.csv"),
        [
            ("2024-01-01T10:00:30.000000", 1.0, 2.0),  # inside UTC slot 10:00
            ("2024-01-01T12:00:30.000000", 9.9, 9.9),  # stamp time = outside
        ],
    )
    cfg = SchedulerConfig(
        scheduler_name="tzsched",
        input_dir=str(indir),
        output_dir=str(outdir),
        components=["pump"],
        tags=["p1", "p2"],
        frequency="PT5M",
        timezone_offset="+02:00",
        delimiter="-",
        filename_ts_format="yyyy-MM-dd-HH-mm-ss",
    )
    sched = InferenceScheduler(spark, cfg, _simple_score_fn)
    sched.create()
    sched.start(available_now=True)
    sched.await_termination()
    sched.stop()
    outs = glob.glob(str(outdir / "results_*.jsonl"))
    assert [os.path.basename(p) for p in outs] == [
        "results_2024-01-01-12-00-00.jsonl"
    ]
    recs = [json.loads(line) for line in open(outs[0])]
    assert [r["timestamp"] for r in recs] == ["2024-01-01 10:00:30"]
    ex = sched.list_inference_executions().collect()
    assert ex[0]["slot_start"] == datetime(2024, 1, 1, 10, 0, 0)


def test_scheduler_missing_file_failed_then_late_append(spark, tmp_path):
    """ST3 parity (reference scheduler.py:187-189, 355-357): a component
    file absent once the delay allowance passes records a FAILED execution
    naming the expected file; a later delivery still scores (append, not
    overwrite) with a catch-up SUCCESS row, and the FAILED row is recorded
    exactly once."""
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    _write_slot_csv(
        str(indir / "pump_20240101100000.csv"),
        [("2024-01-01T10:00:30.000000", 1.0, 2.0)],
    )
    cfg = SchedulerConfig(
        scheduler_name="latesched",
        input_dir=str(indir),
        output_dir=str(outdir),
        components=["pump", "motor"],
        tags=["p1", "p2"],
        frequency="PT5M",
        delay_offset_minutes=5,
    )
    sched = InferenceScheduler(spark, cfg, _simple_score_fn)
    sched.create()
    sched.start(available_now=True)
    sched.await_termination()
    sched.stop()
    out = str(outdir / "results_20240101100000.jsonl")
    assert len(open(out).readlines()) == 1
    # the slot is long past start+freq+delay -> motor's absence is FAILED
    failed = sched.list_inference_executions(
        execution_status="FAILED"
    ).collect()
    assert len(failed) == 1
    assert failed[0]["slot_start"] == datetime(2024, 1, 1, 10, 0, 0)
    assert "motor_20240101100000.csv" in failed[0]["output"]
    assert "pump" not in failed[0]["output"]
    # late arrival: motor's file for the SAME slot lands after the wakeup
    _write_slot_csv(
        str(indir / "motor_20240101100000.csv"),
        [("2024-01-01T10:01:00.000000", 3.0, 4.0)],
    )
    sched.start(available_now=True)
    sched.await_termination()
    sched.stop()
    recs = [json.loads(line) for line in open(out)]
    assert sorted(r["timestamp"] for r in recs) == [
        "2024-01-01 10:00:30",
        "2024-01-01 10:01:00",
    ]
    execs = sched.list_inference_executions().orderBy("output").collect()
    assert sorted(e["status"] for e in execs) == [
        "FAILED",
        "SUCCESS",
        "SUCCESS",
    ]
    # catch-up run scored motor's row; FAILED not duplicated
    assert (
        len(
            sched.list_inference_executions(
                execution_status="FAILED"
            ).collect()
        )
        == 1
    )


def test_audit_missing_files_empty_slot_grid(spark, tmp_path):
    """A slot where NO file at all arrived leaves no micro-batch to piggy-
    back on; audit_missing_files(since=...) walks the slot grid and records
    one FAILED row per due slot listing every expected file."""
    cfg = SchedulerConfig(
        scheduler_name="gridsched",
        input_dir=str(tmp_path / "in"),
        output_dir=str(tmp_path / "out"),
        components=["pump", "motor"],
        tags=["p1"],
        frequency="PT5M",
        delay_offset_minutes=3,
    )
    sched = InferenceScheduler(spark, cfg, _simple_score_fn)
    sched.create()
    n = sched.audit_missing_files(
        now=datetime(2024, 1, 1, 10, 14, 0),
        since=datetime(2024, 1, 1, 10, 0, 0),
    )
    # due slots at 10:14 with 3-min delay: 10:00 (due 10:08), 10:05
    # (due 10:13); 10:10 is due at 10:18 -> not yet
    assert n == 2
    failed = (
        sched.list_inference_executions(execution_status="FAILED")
        .orderBy("slot_start")
        .collect()
    )
    assert [e["slot_start"] for e in failed] == [
        datetime(2024, 1, 1, 10, 0, 0),
        datetime(2024, 1, 1, 10, 5, 0),
    ]
    assert "pump_20240101100000.csv" in failed[0]["output"]
    assert "motor_20240101100000.csv" in failed[0]["output"]
    # idempotent: re-auditing records nothing new
    assert (
        sched.audit_missing_files(
            now=datetime(2024, 1, 1, 10, 14, 0),
            since=datetime(2024, 1, 1, 10, 0, 0),
        )
        == 0
    )
    # ...even from a restarted scheduler (seeded from the durable audit)
    sched2 = InferenceScheduler(spark, cfg, _simple_score_fn)
    assert (
        sched2.audit_missing_files(
            now=datetime(2024, 1, 1, 10, 14, 0),
            since=datetime(2024, 1, 1, 10, 0, 0),
        )
        == 0
    )


def test_scheduler_per_component_schemas(spark, tmp_path):
    """Per-component file contract (reference scheduler.py:196-209): two
    components with DIFFERENT sensor sets stream through one scheduler;
    each file validates against its own header and the slot's scored rows
    carry the merged full feature vector."""
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    with open(indir / "pump_20240101100000.csv", "w") as f:
        f.write("Timestamp,flow,pressure\n")
        f.write("2024-01-01T10:00:30.000000,1.5,7.0\n")
    with open(indir / "motor_20240101100000.csv", "w") as f:
        f.write("Timestamp,rpm\n")
        f.write("2024-01-01T10:00:30.000000,900.0\n")
        f.write("2024-01-01T10:01:30.000000,910.0\n")

    def score_fn(batch):
        # sees the merged union schema: flow, pressure, rpm
        return batch.select(
            F.col("Timestamp").alias("timestamp"),
            F.when(
                F.col("flow").isNotNull() & F.col("rpm").isNotNull(), 1
            ).otherwise(0).alias("prediction"),
            (
                F.coalesce(F.col("flow"), F.lit(0.0))
                + F.coalesce(F.col("rpm"), F.lit(0.0))
            ).alias("anomaly_score"),
        )

    cfg = SchedulerConfig(
        scheduler_name="percomp",
        input_dir=str(indir),
        output_dir=str(outdir),
        components=["pump", "motor"],
        tags=[],
        frequency="PT5M",
        component_columns={
            "pump": ["Timestamp", "flow", "pressure"],
            "motor": ["Timestamp", "rpm"],
        },
    )
    assert cfg.all_tags == ["rpm", "flow", "pressure"]
    sched = InferenceScheduler(spark, cfg, score_fn)
    sched.create()
    sched.start(available_now=True)
    sched.await_termination()
    sched.stop()
    recs = sorted(
        (json.loads(line) for line in open(outdir / "results_20240101100000.jsonl")),
        key=lambda r: r["timestamp"],
    )
    # 10:00:30 exists in BOTH files -> merged row has flow AND rpm
    assert recs[0]["timestamp"] == "2024-01-01 10:00:30"
    assert recs[0]["prediction"] == 1
    assert abs(recs[0]["anomaly_score"] - 901.5) < 1e-9
    # 10:01:30 only in motor's file -> flow null -> prediction 0
    assert recs[1]["timestamp"] == "2024-01-01 10:01:30"
    assert recs[1]["prediction"] == 0
    assert abs(recs[1]["anomaly_score"] - 910.0) < 1e-9
    execs = sched.list_inference_executions().collect()
    assert [e["status"] for e in execs] == ["SUCCESS"]
    assert execs[0]["n_input"] == 3  # pre-merge in-slot file rows
    assert execs[0]["n_scored"] == 2  # merged feature rows


def test_multi_slot_catchup_constant_jobs(spark, tmp_path):
    """A catch-up batch writes every slot file from a CONSTANT number of
    Spark jobs (one metadata aggregate + one partitionBy write + the
    engine's fixed source/commit jobs), not one serial coalesce(1) job per
    slot — 6 slots must cost no more jobs than 1 slot (measured: 5)."""
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    # six PT5M slots 10:00..10:25
    for i in range(6):
        mm = 5 * i
        stamp = f"2024010110{mm:02d}00"
        _write_slot_csv(
            str(indir / f"pump_{stamp}.csv"),
            [(f"2024-01-01T10:{mm:02d}:30.000000", 1.0 + i, 2.0)],
        )
    cfg = SchedulerConfig(
        scheduler_name="catchup",
        input_dir=str(indir),
        output_dir=str(outdir),
        components=["pump"],
        tags=["p1", "p2"],
        frequency="PT5M",
    )
    sched = InferenceScheduler(spark, cfg, _simple_score_fn)
    sched.create()
    sched.start(available_now=True)
    sched.await_termination()
    sched.stop()
    outs = sorted(glob.glob(str(outdir / "results_*.jsonl")))
    assert len(outs) == 6
    for p in outs:
        assert len(open(p).readlines()) == 1
    execs = sched.list_inference_executions().collect()
    assert sorted(e["status"] for e in execs) == ["SUCCESS"] * 6
    job_ids = (
        spark.sparkContext.statusTracker().getJobIdsForGroup(
            "scheduler-catchup-batch-0"
        )
    )
    assert 1 <= len(job_ids) <= 5, job_ids


def test_replay_tz_offset_roundtrip(spark, tmp_path):
    """ST8 + F3: replay file names are stamped in the scheduler's zone
    (-05:00 -> stamp = UTC slot - 5h, reference dataset.py:534); a
    scheduler configured with the same offset converts them back and the
    ST4 event-time filter keeps the (UTC) data rows."""
    rows = [
        (f"2024-01-01 00:{i:02d}:00", "pump", "p1", float(i)) for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "ts string, component string, tag string, value double"
    ).select(F.to_timestamp("ts").alias("ts"), "component", "tag", "value")
    indir = tmp_path / "replay"
    outdir = tmp_path / "out"
    indir.mkdir()
    report = generate_replay_data(
        df,
        str(indir),
        start_at=datetime(2024, 6, 1, 12, 0, 0),
        frequency_minutes=5,
        duration_minutes=10,
        timezone_offset="-05:00",
    )
    names = sorted(os.path.basename(p) for p in report["written"])
    # UTC slots 11:50 and 11:55 stamped at wall time 06:50 / 06:55
    assert names == ["pump_20240601065000.csv", "pump_20240601065500.csv"]
    assert report["empty_slots"] == []

    def score_fn(batch):
        return batch.select(
            F.col("Timestamp").alias("timestamp"),
            F.lit(0).alias("prediction"),
        )

    cfg = SchedulerConfig(
        scheduler_name="tzreplay",
        input_dir=str(indir),
        output_dir=str(outdir),
        components=["pump"],
        tags=["p1"],
        frequency="PT5M",
        timezone_offset="-05:00",
    )
    sched = InferenceScheduler(spark, cfg, score_fn)
    sched.create()
    sched.start(available_now=True)
    sched.await_termination()
    sched.stop()
    execs = sched.list_inference_executions().orderBy("slot_start").collect()
    assert [e["status"] for e in execs] == ["SUCCESS", "SUCCESS"]
    # slots parsed back to UTC; every replay row inside its slot
    assert [e["slot_start"] for e in execs] == [
        datetime(2024, 6, 1, 11, 50, 0),
        datetime(2024, 6, 1, 11, 55, 0),
    ]
    assert [e["n_scored"] for e in execs] == [5, 5]


def test_list_executions_pagination(spark, tmp_path):
    """S11/T3 parity: MaxResults/NextToken paging over >50 executions."""
    cfg = SchedulerConfig(
        scheduler_name="pagesched",
        input_dir=str(tmp_path / "in"),
        output_dir=str(tmp_path / "out"),
        components=["pump"],
        tags=["p1"],
        frequency="PT5M",
        delay_offset_minutes=0,
    )
    sched = InferenceScheduler(spark, cfg, _simple_score_fn)
    sched.create()
    # 55 empty due slots -> 55 FAILED rows
    n = sched.audit_missing_files(
        now=datetime(2024, 1, 1, 10, 0, 0),
        since=datetime(2024, 1, 1, 5, 25, 0),
    )
    assert n == 55
    seen = []
    token = 0
    pages = 0
    while token is not None:
        page, token = sched.list_inference_executions(
            max_results=50, next_token=token
        )
        rows = page.collect()
        seen.extend(rows)
        pages += 1
    assert pages == 2 and len(seen) == 55
    assert len({r["slot_start"] for r in seen}) == 55


def test_audit_log_survives_restart(spark, tmp_path):
    """ST6: a fresh InferenceScheduler over the same output dir still
    lists past executions (durable audit, not just driver memory)."""
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    _write_slot_csv(
        str(indir / "pump_20240101100000.csv"),
        [("2024-01-01T10:00:30.000000", 1.0, 2.0)],
    )
    cfg = SchedulerConfig(
        scheduler_name="audsched",
        input_dir=str(indir),
        output_dir=str(outdir),
        components=["pump"],
        tags=["p1", "p2"],
    )
    sched = InferenceScheduler(spark, cfg, _simple_score_fn)
    sched.create()
    sched.start(available_now=True)
    sched.await_termination()
    sched.stop()
    # "restart": new object, no in-memory rows
    cfg2 = SchedulerConfig(
        scheduler_name="audsched",
        input_dir=str(indir),
        output_dir=str(outdir),
        components=["pump"],
        tags=["p1", "p2"],
    )
    sched2 = InferenceScheduler(spark, cfg2, _simple_score_fn)
    rows = sched2.list_inference_executions().collect()
    assert len(rows) == 1
    assert rows[0]["status"] == "SUCCESS" and rows[0]["n_scored"] == 1
    assert rows[0]["slot_start"] == datetime(2024, 1, 1, 10, 0, 0)


def test_inspection_report(tmp_path):
    cfg = SchedulerConfig(
        scheduler_name="repsched",
        input_dir="/data/in",
        output_dir="/data/out",
        components=["pump", "motor"],
        tags=["p1", "p2"],
        frequency="PT15M",
        delay_offset_minutes=3,
    )
    now = datetime(2024, 1, 1, 10, 17, 42)
    report = build_inspection_report(cfg, now=now)
    assert "**SCHEDULER: repsched**" in report
    assert "every **15 minutes**" in report
    assert "up to **3 minute(s)**" in report
    assert "`/data/in/*.csv`" in report
    # next wakeup after 10:17 on PT15M = 10:30; expected stamp = slot 10:15
    assert "**2024-01-01 10:30:00**" in report
    assert "`pump_20240101101500.csv`" in report
    assert "`motor_20240101101500.csv`" in report
    # row template spans the slot [10:15:00, 10:29:59]
    assert "| 2024-01-01 10:15:00" in report
    assert "| 2024-01-01 10:29:59" in report
    assert "**2 components**" in report
    html_path = str(tmp_path / "report.html")
    export_report_to_html(report, html_path)
    content = open(html_path).read()
    assert content.startswith("<!DOCTYPE html>") and "repsched" in content


def test_stateful_compact_runs_stream(spark, tmp_path):
    """Online M2: a flagged run spanning micro-batches stays open in
    checkpointed state and closes with the correct (start, end, n_points)
    when the flag drops in a later batch — including across a query
    restart (state recovery)."""
    from amazon_lookout_for_equipment_python_sdk_spark.streaming import (
        compact_runs_stream,
    )

    indir = tmp_path / "pred_in"
    outdir = tmp_path / "ranges_out"
    ckpt = str(tmp_path / "ckpt")
    indir.mkdir()
    outdir.mkdir()

    def write_batch(name, rows):
        with open(indir / name, "w") as f:
            f.write("component,timestamp,prediction\n")
            for ts, p in rows:
                f.write(f"m1,{ts},{p}\n")

    def run_once():
        stream = (
            spark.readStream.schema(
                "component string, timestamp timestamp, prediction int"
            )
            .option("header", True)
            .csv(str(indir / "*.csv"))
        )
        ranges = compact_runs_stream(stream, step_seconds=60)
        q = (
            ranges.writeStream.format("parquet")
            .option("path", str(outdir / "data"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: run opens (2 flagged points), nothing closes yet
    write_batch(
        "b1.csv",
        [("2024-01-01 10:00:00", 1), ("2024-01-01 10:01:00", 1)],
    )
    run_once()
    got = spark.read.schema(
        "key string, start timestamp, end timestamp, n_points long"
    ).parquet(str(outdir / "data"))
    assert got.count() == 0  # run still open in state

    # batch 2 (fresh query, same checkpoint -> state recovered): one more
    # flagged point extends the run, then a 0 closes it
    write_batch(
        "b2.csv",
        [("2024-01-01 10:02:00", 1), ("2024-01-01 10:03:00", 0)],
    )
    run_once()
    rows = (
        spark.read.schema(
            "key string, start timestamp, end timestamp, n_points long"
        )
        .parquet(str(outdir / "data"))
        .collect()
    )
    assert len(rows) == 1
    r = rows[0]
    assert r["key"] == "m1"
    assert r["start"] == datetime(2024, 1, 1, 10, 0, 0)
    assert r["end"] == datetime(2024, 1, 1, 10, 2, 0)
    assert r["n_points"] == 3

    # batch 3: a gap larger than step_seconds breaks a run into two
    write_batch(
        "b3.csv",
        [
            ("2024-01-01 11:00:00", 1),
            ("2024-01-01 11:05:00", 1),  # 5-min gap > 60s -> new run
            ("2024-01-01 11:06:00", 0),
        ],
    )
    run_once()
    rows = (
        spark.read.schema(
            "key string, start timestamp, end timestamp, n_points long"
        )
        .parquet(str(outdir / "data"))
        .orderBy("start")
        .collect()
    )
    assert len(rows) == 3
    assert (rows[1]["start"], rows[1]["n_points"]) == (
        datetime(2024, 1, 1, 11, 0, 0),
        1,
    )
    assert (rows[2]["start"], rows[2]["n_points"]) == (
        datetime(2024, 1, 1, 11, 5, 0),
        1,
    )


def test_prepare_inference_data(spark, tmp_path):
    """Reference dataset.py:242-336 parity: 2 sequences extracted from
    start_date, restamped to the next wakeup slots, one CSV per component
    per sequence with the stamp in the file name."""
    from amazon_lookout_for_equipment_python_sdk_spark.streaming import (
        prepare_inference_data,
    )

    rows = []
    for i in range(20):  # 20 minutes of 1-min data, 2 components
        ts = f"2024-01-01 08:{i:02d}:00"
        rows.append((ts, "pump", "p1", float(i)))
        rows.append((ts, "motor", "m1", float(i * 2)))
    df = spark.createDataFrame(
        rows, "ts string, component string, tag string, value double"
    ).select(F.to_timestamp("ts").alias("ts"), "component", "tag", "value")
    out = tmp_path / "inf_in"
    out.mkdir()
    report = prepare_inference_data(
        df,
        str(out),
        start_date="2024-01-01 08:00:00",
        num_sequences=2,
        frequency_minutes=5,
        now=datetime(2024, 6, 1, 12, 3, 0),  # floors to 12:00
    )
    assert report["slots"] == ["20240601120000", "20240601120500"]
    names = sorted(os.path.basename(p) for p in report["written"])
    assert names == [
        "motor_20240601120000.csv",
        "motor_20240601120500.csv",
        "pump_20240601120000.csv",
        "pump_20240601120500.csv",
    ]
    # rows restamped positionally at freq spacing from the slot stamp
    lines = open(out / "pump_20240601120000.csv").read().splitlines()
    stamps = [ln.split(",")[0] for ln in lines[1:]]
    assert stamps[0] == "2024-06-01T12:00:00.000000"
    assert stamps[1] == "2024-06-01T12:05:00.000000"
    assert len(stamps) == 5  # five 1-min rows in the 5-min window


def test_streaming_resample_watermark(spark, tmp_path):
    """A1 streaming twin: append mode finalizes a window only after the
    watermark passes its end; in-allowance late rows still count."""
    from amazon_lookout_for_equipment_python_sdk_spark.streaming import (
        streaming_resample_mean,
    )

    indir = tmp_path / "ts_in"
    outdir = tmp_path / "ts_out"
    ckpt = str(tmp_path / "ts_ckpt")
    indir.mkdir()
    outdir.mkdir()

    def write_batch(name, rows):
        with open(indir / name, "w") as f:
            f.write("tag,ts,value\n")
            for ts, v in rows:
                f.write(f"s1,{ts},{v}\n")

    def run_once():
        stream = (
            spark.readStream.schema("tag string, ts timestamp, value double")
            .option("header", True)
            .csv(str(indir / "*.csv"))
        )
        out = streaming_resample_mean(
            stream, 300, watermark="5 minutes"
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", str(outdir / "data"))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    out_schema = "tag string, bucket_ts timestamp, avg_value double"
    # batch 1: two rows in window 10:00-10:05 + one late-ish row in the
    # same window + a row advancing event time past window end + allowance
    write_batch(
        "b1.csv",
        [
            ("2024-01-01 10:00:30", 10.0),
            ("2024-01-01 10:01:30", 20.0),
            ("2024-01-01 10:02:00", 30.0),
            ("2024-01-01 10:12:00", 99.0),  # watermark -> 10:07 > 10:05
        ],
    )
    run_once()
    # window finalization emits on the next trigger after the watermark
    # advances; drive one more (possibly empty) batch
    write_batch("b2.csv", [("2024-01-01 10:13:00", 1.0)])
    run_once()
    rows = {
        r["bucket_ts"]: r["avg_value"]
        for r in spark.read.schema(out_schema)
        .parquet(str(outdir / "data"))
        .collect()
    }
    assert datetime(2024, 1, 1, 10, 0, 0) in rows, rows
    assert abs(rows[datetime(2024, 1, 1, 10, 0, 0)] - 20.0) < 1e-9


def test_replay_generator_empty_slots(spark, tmp_path):
    rows = []
    # 30 minutes of history with a 10-minute hole (minutes 10..19)
    for i in list(range(10)) + list(range(20, 30)):
        rows.append((f"2024-01-01 00:{i:02d}:00", "pump", "p1", float(i)))
    df = spark.createDataFrame(
        rows, "ts string, component string, tag string, value double"
    ).select(F.to_timestamp("ts").alias("ts"), "component", "tag", "value")
    out = tmp_path / "replay"
    out.mkdir()
    report = generate_replay_data(
        df,
        str(out),
        start_at=datetime(2024, 6, 1, 12, 0, 0),
        frequency_minutes=5,
        duration_minutes=30,
    )
    assert report["components"] == ["pump"]
    assert report["n_slots"] == 6
    # the 10-minute hole = 2 empty slots recorded as missing
    assert len(report["empty_slots"]) == 2
    assert len(report["written"]) == 4


def test_get_predictions_reads_all_outputs(spark, tmp_path):
    """Reference get_predictions parity (scheduler.py:598-662): all
    executions' JSON-lines concatenated, time-sorted, diagnostics
    expandable to component\\tag columns (N1)."""
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    for mm in (0, 5):
        _write_slot_csv(
            str(indir / f"pump_2024010110{mm:02d}00.csv"),
            [(f"2024-01-01T10:{mm:02d}:30.000000", 1.0 + mm, 2.0)],
        )

    def score_fn(batch):
        return batch.select(
            F.col("Timestamp").alias("timestamp"),
            F.when(F.col("p1") > 2.0, 1).otherwise(0).alias("prediction"),
            F.lit(0.5).alias("anomaly_score"),
            F.when(
                F.col("p1") > 2.0,
                F.array(
                    F.struct(
                        F.lit("pump\\p1").alias("name"), F.lit(1.0).alias("value")
                    )
                ),
            ).alias("diagnostics"),
        )

    cfg = SchedulerConfig(
        scheduler_name="gp",
        input_dir=str(indir),
        output_dir=str(outdir),
        components=["pump"],
        tags=["p1", "p2"],
    )
    sched = InferenceScheduler(spark, cfg, score_fn)
    sched.create()
    sched.start(available_now=True)
    sched.await_termination()
    sched.stop()
    preds = sched.get_predictions().collect()
    assert [r["timestamp"] for r in preds] == [
        datetime(2024, 1, 1, 10, 0, 30),
        datetime(2024, 1, 1, 10, 5, 30),
    ]
    assert [r["prediction"] for r in preds] == [0, 1]
    wide = sched.get_predictions(expand_diagnostics=True)
    assert "pump\\p1" in wide.columns
    row = wide.filter(F.col("prediction") == 1).collect()[0]
    assert row["pump\\p1"] == 1.0
    # time filters
    only_late = sched.get_predictions(
        start_time=datetime(2024, 1, 1, 10, 5, 0)
    ).collect()
    assert len(only_late) == 1
    # empty dir -> empty typed frame, not a crash
    cfg2 = SchedulerConfig(
        scheduler_name="gp2",
        input_dir=str(indir),
        output_dir=str(tmp_path / "out2"),
        components=["pump"],
        tags=["p1", "p2"],
    )
    empty = InferenceScheduler(spark, cfg2, score_fn).get_predictions()
    assert empty.count() == 0
    assert "diagnostics" in empty.columns


def test_streaming_dedup_exact(spark, tmp_path):
    """Online exact dedup: duplicates across micro-batches are dropped via
    checkpointed fingerprint state; watermark bounds the state."""
    from amazon_lookout_for_equipment_python_sdk_spark.streaming import (
        streaming_dedup_exact,
    )

    indir = tmp_path / "docs_in"
    outdir = tmp_path / "docs_out"
    ckpt = str(tmp_path / "docs_ckpt")
    indir.mkdir()
    outdir.mkdir()

    def write_batch(name, rows):
        with open(indir / name, "w") as f:
            f.write("doc_id,ts,text\n")
            for i, ts, txt in rows:
                f.write(f"{i},{ts},{txt}\n")

    def run_once():
        stream = (
            spark.readStream.schema(
                "doc_id long, ts timestamp, text string"
            )
            .option("header", True)
            .csv(str(indir / "*.csv"))
        )
        deduped = streaming_dedup_exact(
            stream, ts_col="ts", watermark="10 minutes"
        )
        q = (
            deduped.writeStream.format("parquet")
            .option("path", str(outdir / "data"))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_batch(
        "b1.csv",
        [
            (1, "2024-01-01 10:00:00", "alpha doc"),
            (2, "2024-01-01 10:00:30", "alpha doc"),  # in-batch dup
            (3, "2024-01-01 10:01:00", "beta doc"),
        ],
    )
    run_once()
    # cross-batch dup of 'beta doc' inside the watermark -> dropped
    write_batch(
        "b2.csv",
        [
            (4, "2024-01-01 10:02:00", "beta doc"),
            (5, "2024-01-01 10:03:00", "gamma doc"),
        ],
    )
    run_once()
    rows = (
        spark.read.schema("doc_id long, ts timestamp, text string")
        .parquet(str(outdir / "data"))
        .collect()
    )
    texts = sorted(r["text"] for r in rows)
    assert texts == ["alpha doc", "beta doc", "gamma doc"]
    assert len({r["text"] for r in rows}) == len(rows)


def test_replay_to_percomponent_scheduler_roundtrip(spark, tmp_path):
    """Integration seam: generate_replay_data now writes per-component
    columns (S9 fidelity), and the per-component scheduler must consume
    its own replay output end-to-end — validated headers, merged feature
    rows, get_predictions over the results."""
    rows = []
    for i in range(10):
        ts = f"2024-01-01 00:{i:02d}:00"
        rows.append((ts, "pump", "flow", 1.0 + i))
        rows.append((ts, "pump", "pressure", 7.0 + i))
        rows.append((ts, "motor", "rpm", 900.0 + i))
    df = spark.createDataFrame(
        rows, "ts string, component string, tag string, value double"
    ).select(F.to_timestamp("ts").alias("ts"), "component", "tag", "value")
    indir = tmp_path / "replay_in"
    outdir = tmp_path / "out"
    indir.mkdir()
    report = generate_replay_data(
        df, str(indir), start_at=datetime(2024, 6, 1, 12, 0, 0),
        frequency_minutes=5, duration_minutes=10,
    )
    assert report["empty_slots"] == []
    # per-component columns in the replay files (S9 <-> ST2 contract)
    with open(indir / "pump_20240601115000.csv") as f:
        assert f.readline().strip() == "Timestamp,flow,pressure"
    with open(indir / "motor_20240601115000.csv") as f:
        assert f.readline().strip() == "Timestamp,rpm"

    def score_fn(batch):
        return batch.select(
            F.col("Timestamp").alias("timestamp"),
            F.when(
                F.col("flow").isNotNull() & F.col("rpm").isNotNull(), 1
            ).otherwise(0).alias("prediction"),
        )

    cfg = SchedulerConfig(
        scheduler_name="rtpc",
        input_dir=str(indir),
        output_dir=str(outdir),
        components=["pump", "motor"],
        tags=[],
        frequency="PT5M",
        component_columns={
            "pump": ["Timestamp", "flow", "pressure"],
            "motor": ["Timestamp", "rpm"],
        },
    )
    sched = InferenceScheduler(spark, cfg, score_fn)
    sched.create()
    sched.start(available_now=True)
    sched.await_termination()
    sched.stop()
    execs = sched.list_inference_executions().collect()
    assert sorted(e["status"] for e in execs) == ["SUCCESS", "SUCCESS"]
    preds = sched.get_predictions().collect()
    # every slot row has both components' sensors -> all predictions 1
    assert len(preds) == 10
    assert all(r["prediction"] == 1 for r in preds)


def test_sessionize_stream_gap_and_timeout(spark, tmp_path):
    """Online sessionization: an in-batch gap closes a session immediately;
    the open tail survives micro-batches in state; the event-time timeout
    closes an idle session once the watermark passes last_ts + gap."""
    from amazon_lookout_for_equipment_python_sdk_spark.streaming import (
        sessionize_stream,
    )

    indir = tmp_path / "sess_in"
    outdir = tmp_path / "sess_out"
    ckpt = str(tmp_path / "sess_ckpt")
    indir.mkdir()
    outdir.mkdir()

    def write_batch(name, rows):
        with open(indir / name, "w") as f:
            f.write("user_id,ts\n")
            for uid, ts in rows:
                f.write(f"{uid},{ts}\n")

    def run_once():
        stream = (
            spark.readStream.schema("user_id string, ts timestamp")
            .option("header", True)
            .csv(str(indir / "*.csv"))
        )
        sessions = sessionize_stream(
            stream, gap_minutes=30, watermark="10 minutes"
        )
        q = (
            sessions.writeStream.format("parquet")
            .option("path", str(outdir / "data"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def read_out():
        return spark.read.schema(SESSION_READ_SCHEMA).parquet(
            str(outdir / "data")
        )

    SESSION_READ_SCHEMA = (
        "key string, session_start timestamp, session_end timestamp, "
        "n_events long"
    )

    # batch 1: user A has two events 10:00/10:05, then a 31-min gap to
    # 10:36 -> first session closes in-batch, second stays open in state
    write_batch(
        "b1.csv",
        [
            ("A", "2024-01-01 10:00:00"),
            ("A", "2024-01-01 10:05:00"),
            ("A", "2024-01-01 10:36:00"),
        ],
    )
    run_once()
    rows = read_out().collect()
    assert len(rows) == 1
    assert rows[0]["n_events"] == 2
    assert str(rows[0]["session_end"]) == "2024-01-01 10:05:00"

    # batch 2: user B far in the future pushes the watermark past A's
    # last_ts + gap; a further batch lets the engine fire A's timeout
    write_batch("b2.csv", [("B", "2024-01-01 13:00:00")])
    run_once()
    write_batch("b3.csv", [("B", "2024-01-01 13:01:00")])
    run_once()
    by_key = {
        (r["key"], str(r["session_start"])): r for r in read_out().collect()
    }
    idle = by_key.get(("A", "2024-01-01 10:36:00"))
    assert idle is not None, f"timeout session missing: {sorted(by_key)}"
    assert idle["n_events"] == 1
    assert str(idle["session_end"]) == "2024-01-01 10:36:00"


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Equivalence: replaying a fixture through sessionize_stream yields
    exactly the session set the batch ``sessionize`` computes on the same
    rows — (key, start, end, n_events) for every CLOSED session.  A
    far-future sentinel user pushes the watermark past every real event so
    all real sessions close; the sentinel's own open session is excluded."""
    import datetime as dt
    import random

    from amazon_lookout_for_equipment_python_sdk_spark.operators.timeseries import (
        sessionize,
    )
    from amazon_lookout_for_equipment_python_sdk_spark.streaming import (
        sessionize_stream,
    )

    rng = random.Random(17)
    t0 = dt.datetime(2024, 1, 1, 8, 0, 0)
    rows = []
    for uid in ("A", "B", "C"):
        t = t0
        for _ in range(40):
            t = t + dt.timedelta(minutes=rng.choice([0, 1, 5, 29, 30, 31, 95]))
            rows.append((uid, t))
    rows.sort(key=lambda r: r[1])

    indir = tmp_path / "eq_in"
    outdir = tmp_path / "eq_out"
    ckpt = str(tmp_path / "eq_ckpt")
    indir.mkdir()
    outdir.mkdir()

    def write_batch(name, batch):
        with open(indir / name, "w") as f:
            f.write("user_id,ts\n")
            for uid, ts in batch:
                f.write(f"{uid},{ts}\n")

    def run_once():
        stream = (
            spark.readStream.schema("user_id string, ts timestamp")
            .option("header", True)
            .csv(str(indir / "*.csv"))
        )
        q = (
            sessionize_stream(stream, gap_minutes=30, watermark="10 minutes")
            .writeStream.format("parquet")
            .option("path", str(outdir / "data"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # replay in 3 time-ordered chunks, then sentinel batches that advance
    # the watermark far past the data and fire the idle timeouts
    n = len(rows)
    write_batch("b1.csv", rows[: n // 3])
    run_once()
    write_batch("b2.csv", rows[n // 3 : 2 * n // 3])
    run_once()
    write_batch("b3.csv", rows[2 * n // 3 :])
    run_once()
    far = max(r[1] for r in rows) + dt.timedelta(days=2)
    write_batch("b4.csv", [("ZZ", far)])
    run_once()
    write_batch("b5.csv", [("ZZ", far + dt.timedelta(minutes=1))])
    run_once()

    streamed = {
        (r["key"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.schema(
            "key string, session_start timestamp, session_end timestamp, "
            "n_events long"
        )
        .parquet(str(outdir / "data"))
        .collect()
        if r["key"] != "ZZ"
    }

    batch_df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(batch_df, key_col="user_id", gap_minutes=30)
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .collect()
    }
    assert streamed == batch


def test_sessionize_stream_null_key_matches_batch(spark, tmp_path):
    """NULL-key contract through the STREAMING twin (r11): batch
    sessionize treats a NULL key as one ordinary group (window
    partitionBy semantics — the r11 null-key class fix pins the chunked
    twin to that), and the streaming form must agree: groupBy(null)
    reaches the state kernel like any key.  Replay a fixture where one
    'user' is NULL and compare closed sessions to batch."""
    import datetime as dt

    from amazon_lookout_for_equipment_python_sdk_spark.operators.timeseries import (
        sessionize,
    )
    from amazon_lookout_for_equipment_python_sdk_spark.streaming import (
        sessionize_stream,
    )

    t0 = dt.datetime(2024, 1, 1, 8, 0, 0)
    rows = []
    for uid, gaps in (
        ("A", [0, 5, 95, 1, 40]),
        (None, [0, 10, 31, 2, 60, 1]),
    ):
        t = t0
        for g in gaps:
            t = t + dt.timedelta(minutes=g)
            rows.append((uid, t))
    rows.sort(key=lambda r: r[1])

    indir = tmp_path / "nk_in"
    outdir = tmp_path / "nk_out"
    ckpt = str(tmp_path / "nk_ckpt")
    indir.mkdir()
    outdir.mkdir()

    def write_batch(name, batch):
        with open(indir / name, "w") as f:
            f.write("user_id,ts\n")
            for uid, ts in batch:
                f.write(f"{uid if uid is not None else ''},{ts}\n")

    def run_once():
        stream = (
            spark.readStream.schema("user_id string, ts timestamp")
            .option("header", True)
            .csv(str(indir / "*.csv"))
        )
        q = (
            sessionize_stream(stream, gap_minutes=30, watermark="10 minutes")
            .writeStream.format("parquet")
            .option("path", str(outdir / "data"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    n = len(rows)
    write_batch("b1.csv", rows[: n // 2])
    run_once()
    write_batch("b2.csv", rows[n // 2 :])
    run_once()
    far = max(r[1] for r in rows) + dt.timedelta(days=2)
    write_batch("b3.csv", [("ZZ", far)])
    run_once()
    write_batch("b4.csv", [("ZZ", far + dt.timedelta(minutes=1))])
    run_once()

    streamed = {
        (r["key"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.schema(
            "key string, session_start timestamp, session_end timestamp, "
            "n_events long"
        )
        .parquet(str(outdir / "data"))
        .collect()
        if r["key"] != "ZZ"
    }
    batch_df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(batch_df, key_col="user_id", gap_minutes=30)
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .collect()
    }
    assert streamed == batch
    assert any(k is None for k, *_ in streamed)  # the NULL group closed


def test_stateless_text_ops_compose_with_streams(spark, tmp_path):
    """The corpus text operators are stateless projections/filters, so the
    SAME functions run unchanged on a readStream plan — streamed output
    equals the batch result on identical rows (the streaming-compat
    contract for the quality-gate pipeline stage)."""
    from amazon_lookout_for_equipment_python_sdk_spark.operators import (
        text as tx,
    )

    indir = tmp_path / "txt_in"
    outdir = tmp_path / "txt_out"
    indir.mkdir()
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "a a a a a a a a"),
        (3, "supercalifragilistic expialidocious"),
        (4, "data row the a data row"),
    ]
    with open(indir / "docs.csv", "w") as f:
        f.write("doc_id,text\n")
        for i, t in rows:
            f.write(f'{i},"{t}"\n')

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("header", True)
        .csv(str(indir / "*.csv"))
    )
    q = (
        tx.quality_filter(stream, min_tokens=3, max_stopword_ratio=0.6)
        .writeStream.format("parquet")
        .option("path", str(outdir / "data"))
        .option("checkpointLocation", str(tmp_path / "txt_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch_df = spark.createDataFrame(rows, "doc_id long, text string")
    expect = {
        tuple(r)
        for r in tx.quality_filter(
            batch_df, min_tokens=3, max_stopword_ratio=0.6
        ).collect()
    }
    got = {
        tuple(r)
        for r in spark.read.parquet(str(outdir / "data")).collect()
    }
    assert got == expect and len(got) >= 1


def test_streaming_minhash_candidates_match_batch(spark, tmp_path):
    """Equivalence: replaying a doc corpus through
    streaming_minhash_candidates in several micro-batches yields exactly
    the batch minhash_candidate_pairs set — same signatures, same bucket
    collisions, same first-matching-band cross-band dedup."""
    from amazon_lookout_for_equipment_python_sdk_spark.operators.dedup import (
        minhash_candidate_pairs,
    )
    from amazon_lookout_for_equipment_python_sdk_spark.streaming import (
        streaming_minhash_candidates,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while spark plans "
        "queries with catalyst and tungsten at scale"
    )
    words = base.split()
    docs = []
    for i in range(12):
        # 4 near-dup families of 3 docs each: tiny word substitutions
        fam, var = divmod(i, 3)
        w = list(words)
        w[2] = f"tint{fam}"
        if var:
            w[-1] = f"alt{var}"
        docs.append((i, " ".join(w)))
    docs += [(100 + i, f"totally unrelated text number {i} about nothing "
              f"else whatsoever in particular today") for i in range(4)]

    indir = tmp_path / "mh_in"
    outdir = tmp_path / "mh_out"
    indir.mkdir()

    def write_batch(name, rows):
        with open(indir / name, "w") as f:
            f.write("doc_id|text\n")
            for i, t in rows:
                f.write(f"{i}|{t}\n")

    def run_once():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("header", True)
            .option("sep", "|")
            .csv(str(indir / "*.csv"))
        )
        q = (
            streaming_minhash_candidates(stream, num_perm=8, bands=2)
            .writeStream.format("parquet")
            .option("path", str(outdir / "data"))
            .option("checkpointLocation", str(tmp_path / "mh_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # replay in 3 chunks: pairs must surface across micro-batch boundaries
    write_batch("b1.csv", docs[:6])
    run_once()
    write_batch("b2.csv", docs[6:11])
    run_once()
    write_batch("b3.csv", docs[11:])
    run_once()

    streamed = {
        tuple(sorted((int(r["a"]), int(r["b"]))))
        for r in spark.read.schema(
            "a string, b string, band int"
        ).parquet(str(outdir / "data")).collect()
    }
    batch_df = spark.createDataFrame(docs, "doc_id long, text string")
    batch = {
        tuple(sorted((r["a"], r["b"])))
        for r in minhash_candidate_pairs(
            batch_df, num_perm=8, bands=2, max_bucket=None
        ).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_streaming_verified_pairs_match_batch(spark, tmp_path):
    """Equivalence: replaying a corpus through streaming_ngram_jaccard_lsh
    in several micro-batches yields exactly the batch ngram_jaccard_lsh
    VERIFIED pair set — same candidates, same carried-hash exact Jaccard,
    bit-equal n_common/n_union/jaccard."""
    from amazon_lookout_for_equipment_python_sdk_spark.operators.dedup import (
        ngram_jaccard_lsh,
    )
    from amazon_lookout_for_equipment_python_sdk_spark.streaming import (
        streaming_ngram_jaccard_lsh,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while spark plans "
        "queries with catalyst and tungsten at scale"
    )
    words = base.split()
    docs = []
    for i in range(12):
        fam, var = divmod(i, 3)
        w = list(words)
        w[2] = f"tint{fam}"
        if var:
            w[-1] = f"alt{var}"
        docs.append((i, " ".join(w)))
    docs += [(100 + i, f"totally unrelated text number {i} about nothing "
              f"else whatsoever in particular today") for i in range(4)]

    indir = tmp_path / "vp_in"
    outdir = tmp_path / "vp_out"
    indir.mkdir()

    def write_batch(name, rows):
        with open(indir / name, "w") as f:
            f.write("doc_id|text\n")
            for i, t in rows:
                f.write(f"{i}|{t}\n")

    def run_once():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("header", True)
            .option("sep", "|")
            .csv(str(indir / "*.csv"))
        )
        q = (
            streaming_ngram_jaccard_lsh(
                stream, num_perm=8, bands=2, threshold=0.5
            )
            .writeStream.format("parquet")
            .option("path", str(outdir / "data"))
            .option("checkpointLocation", str(tmp_path / "vp_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_batch("b1.csv", docs[:6])
    run_once()
    write_batch("b2.csv", docs[6:11])
    run_once()
    write_batch("b3.csv", docs[11:])
    run_once()

    # the stream casts ids to string for state generality, so its pair
    # order is string-sorted; normalize (min, max) numerically on both
    streamed = {
        (*sorted((int(r["a"]), int(r["b"]))), r["n_common"], r["n_union"],
         r["jaccard"])
        for r in spark.read.schema(
            "a string, b string, n_common int, n_union int, jaccard double"
        ).parquet(str(outdir / "data")).collect()
    }
    batch_df = spark.createDataFrame(docs, "doc_id long, text string")
    batch = {
        (*sorted((int(r["a"]), int(r["b"]))), r["n_common"], r["n_union"],
         r["jaccard"])
        for r in ngram_jaccard_lsh(
            batch_df, num_perm=8, bands=2, threshold=0.5, max_bucket=None
        ).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_streaming_lang_centroids_match_batch(spark, tmp_path):
    """Windowed centroid drift monitor: replaying vectors through
    streaming_lang_centroids equals the same quantized-mean computed in
    batch per window — integer sums make the equality exact."""
    import math

    from amazon_lookout_for_equipment_python_sdk_spark.streaming import (
        streaming_lang_centroids,
    )

    from datetime import datetime

    rows = []
    for i in range(40):
        lang = ["en", "de"][i % 2]
        ts = datetime(2026, 1, 1, 0, i // 10, (i * 7) % 60)
        vec = [round(math.sin(i * 0.37 + d), 4) for d in range(4)]
        rows.append((i, ts, lang, vec))

    indir = tmp_path / "cent_in"
    outdir = tmp_path / "cent_out"
    indir.mkdir()
    schema = "vec_id long, ts timestamp, lang string, embedding array<float>"
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.parquet(str(indir / "b1"))

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(indir / "*"))
        q = (
            streaming_lang_centroids(stream, window_seconds=60)
            .writeStream.format("parquet")
            .option("path", str(outdir / "data"))
            .option("checkpointLocation", str(tmp_path / "cent_ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    # advance the watermark past every data window, then drive one more
    # batch so the closed windows emit (append-mode finalization)
    sentinel = spark.createDataFrame(
        [(999, datetime(2026, 1, 1, 6, 0, 0), "en", [0.0, 0.0, 0.0, 0.0])],
        schema,
    )
    sentinel.coalesce(1).write.parquet(str(indir / "b2"))
    run_once()
    streamed = {
        (str(r["window_start"]), r["lang"], r["pos"]): (
            r["n_vecs"],
            r["centroid"],
        )
        for r in spark.read.schema(
            "window_start timestamp, lang string, pos long, "
            "n_vecs long, centroid double"
        ).parquet(str(outdir / "data")).collect()
    }

    from pyspark.sql import functions as F

    ex = df.select(
        F.window("ts", "60 seconds").alias("w"),
        "lang",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
    ).withColumn("xq", F.floor(F.col("x") * F.lit(1048576.0) + F.lit(0.5)).cast("long"))
    batch = {
        (str(r["ws"]), r["lang"], r["pos"]): (r["n"], r["c"])
        for r in ex.groupBy("w", "lang", "pos")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("xq").alias("s"))
        .select(
            F.col("w.start").alias("ws"),
            "lang",
            "pos",
            F.col("n"),
            (F.col("s").cast("double") / (F.col("n") * F.lit(1048576.0))).alias("c"),
        )
        .collect()
    }
    assert streamed == batch and len(batch) > 0


def test_streaming_topk_spacesaving(spark, tmp_path):
    """Space-Saving heavy hitters: with distinct tokens <= capacity the
    final snapshot is EXACT per group and survives restarts via state;
    with an overflowing table the one-sided guarantee holds
    (est - err <= true <= est) and every true heavy hitter is present."""
    from collections import Counter

    from amazon_lookout_for_equipment_python_sdk_spark.streaming import (
        streaming_topk_tokens,
    )

    indir = tmp_path / "hh_in"
    outdir = tmp_path / "hh_out"
    indir.mkdir()

    b1 = [("g1", t) for t in ["a"] * 5 + ["b"] * 3 + ["c"] * 2]
    b2 = [("g1", t) for t in ["a"] * 2 + ["b"] * 4 + ["d"] * 1] + [
        ("g2", t) for t in ["x"] * 3 + ["y"] * 1
    ]
    truth = Counter(b1) + Counter(b2)

    def write_batch(name, rows):
        with open(indir / name, "w") as f:
            f.write("grp|token\n")
            for g, t in rows:
                f.write(f"{g}|{t}\n")

    def run_once():
        stream = (
            spark.readStream.schema("grp string, token string")
            .option("header", True)
            .option("sep", "|")
            .csv(str(indir / "*.csv"))
        )
        q = (
            streaming_topk_tokens(stream, capacity=16, k=5)
            .writeStream.format("parquet")
            .option("path", str(outdir / "data"))
            .option("checkpointLocation", str(tmp_path / "hh_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_batch("b1.csv", b1)
    run_once()
    write_batch("b2.csv", b2)
    run_once()  # restart: counters recover from checkpointed state

    out = spark.read.parquet(str(outdir / "data"))
    # take each group's LAST snapshot = rows whose est totals cover both
    # batches (capacity 16 > distincts, so counts are exact)
    final = {
        (r.grp, r.token): (r.est, r.err)
        for r in out.collect()
        if (r.grp, r.token, r.est)
        in {(g, t, c) for (g, t), c in truth.items()}
    }
    for (g, t), c in truth.items():
        assert final[(g, t)] == (c, 0), (g, t, c, final.get((g, t)))

    # overflow behavior: tiny capacity still upper-bounds truth
    from amazon_lookout_for_equipment_python_sdk_spark.streaming.stateful import (
        _spacesaving_batch,
    )
    import pandas as pd

    class FakeState:
        exists = False

        def update(self, v):
            self.exists = True
            self.get = v

    toks = ["h"] * 30 + ["i"] * 20 + [f"noise{j}" for j in range(40)] * 1 + ["h"] * 10
    st = FakeState()
    (snap,) = list(
        _spacesaving_batch(
            ("g",), iter([pd.DataFrame({"token": toks})]), st, 8, 4
        )
    )
    true = Counter(toks)
    got = {r.token: (r.est, r.err) for _, r in snap.iterrows()}
    assert "h" in got and "i" in got  # true heavy hitters survive
    for tok, (est, err) in got.items():
        assert est >= true[tok] >= est - err


def test_streaming_quantile_p2(spark, tmp_path):
    """P² online quantile: exact below five observations, within a few
    percent of the true quantile on a replayed distribution, state
    recovers across restarts, and the unit-level sketch matches numpy
    within tolerance on two distributions."""
    import numpy as np
    import pandas as pd

    from amazon_lookout_for_equipment_python_sdk_spark.streaming import (
        streaming_quantile_p2,
    )
    from amazon_lookout_for_equipment_python_sdk_spark.streaming.stateful import (
        _p2_batch,
    )

    class FakeState:
        exists = False

        def update(self, v):
            self.exists = True
            self.get = v

    rng = np.random.default_rng(7)
    for dist in (rng.normal(50, 10, 4000), rng.exponential(5.0, 4000)):
        st = FakeState()
        last = None
        for chunk in np.array_split(dist, 5):  # multi-batch ingestion
            (snap,) = list(
                _p2_batch(("k",), iter([pd.DataFrame({"value": chunk})]), st, 0.5)
            )
            last = snap
        true = float(np.quantile(dist, 0.5))
        spread = float(np.quantile(dist, 0.9) - np.quantile(dist, 0.1))
        assert abs(last["q_est"][0] - true) < 0.05 * spread, (
            last["q_est"][0],
            true,
        )
    # tiny stream: exact
    st = FakeState()
    (snap,) = list(
        _p2_batch(("k",), iter([pd.DataFrame({"value": [3.0, 1.0, 2.0]})]), st, 0.5)
    )
    assert snap["q_est"][0] == 2.0 and bool(snap["exact"][0])

    # at exactly five observations the markers are still the sorted
    # sample, so any q (not just 0.5) must report the exact sample
    # quantile; the sixth observation flips exact off
    st = FakeState()
    five = pd.DataFrame({"value": [10.0, 40.0, 20.0, 50.0, 30.0]})
    (snap,) = list(_p2_batch(("k",), iter([five]), st, 0.9))
    assert snap["q_est"][0] == 50.0 and bool(snap["exact"][0])
    (snap,) = list(
        _p2_batch(("k",), iter([pd.DataFrame({"value": [25.0]})]), st, 0.9)
    )
    assert not bool(snap["exact"][0])

    # end-to-end through Structured Streaming with a restart
    indir = tmp_path / "p2_in"
    outdir = tmp_path / "p2_out"
    indir.mkdir()
    vals = rng.normal(100, 20, 600)

    def write_batch(name, arr):
        with open(indir / name, "w") as f:
            f.write("key|value\n")
            for v in arr:
                f.write(f"g|{v}\n")

    def run_once():
        stream = (
            spark.readStream.schema("key string, value double")
            .option("header", True)
            .option("sep", "|")
            .csv(str(indir / "*.csv"))
        )
        qr = (
            streaming_quantile_p2(stream, q=0.5)
            .writeStream.format("parquet")
            .option("path", str(outdir / "data"))
            .option("checkpointLocation", str(tmp_path / "p2_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        qr.awaitTermination()

    write_batch("b1.csv", vals[:300])
    run_once()
    write_batch("b2.csv", vals[300:])
    run_once()
    out = spark.read.parquet(str(outdir / "data")).orderBy("n").collect()
    assert out[-1].n == 600  # counts survived the restart
    assert abs(out[-1].q_est - float(np.quantile(vals, 0.5))) < 3.0


def test_streaming_zscore_matches_batch(spark, tmp_path):
    """Online z-score is bit-equal to the batch rolling_zscore on an
    in-order replay split across micro-batches (unit level via FakeState
    chunks + end-to-end through Structured Streaming)."""
    import numpy as np
    import pandas as pd

    from amazon_lookout_for_equipment_python_sdk_spark.operators.stats import (
        rolling_zscore,
    )
    from amazon_lookout_for_equipment_python_sdk_spark.streaming import (
        streaming_zscore,
    )
    from amazon_lookout_for_equipment_python_sdk_spark.streaming.stateful import (
        _zscore_batch,
    )

    rng = np.random.RandomState(21)
    n = 300
    vals = np.round(rng.normal(40, 6, n), 2)
    ts = pd.to_datetime(np.arange(n) * 60 + 1_700_000_000, unit="s")

    batch_df = spark.createDataFrame(
        [
            ("a", int(i), float(vals[i]), ts[i].to_pydatetime())
            for i in range(n)
        ],
        "event_type string, event_id long, value double, ts timestamp",
    )
    want = {
        r["event_id"]: r["zscore"]
        for r in rolling_zscore(batch_df, 30).collect()
    }

    class FakeState:
        exists = False

        def update(self, v):
            self.exists = True
            self.get = v

    st = FakeState()
    got = {}
    for lo in range(0, n, 100):  # 3 micro-batches
        chunk = pd.DataFrame(
            {
                "ts": ts[lo : lo + 100],
                "event_id": np.arange(lo, min(lo + 100, n)),
                "value": vals[lo : lo + 100],
            }
        )
        for out in _zscore_batch(("a",), iter([chunk]), st, 30, 100):
            for eid, z in zip(out["event_id"], out["zscore"]):
                got[int(eid)] = None if z is None or pd.isna(z) else float(z)
    assert set(got) == set(want)
    for eid in want:
        if want[eid] is None:
            assert got[eid] is None
        else:
            assert got[eid] == want[eid], (eid, got[eid], want[eid])

    # end-to-end: two availableNow passes over a growing CSV dir
    indir = tmp_path / "zs_in"
    indir.mkdir()

    def write_batch(name, lo, hi):
        with open(indir / name, "w") as f:
            f.write("event_type|event_id|value|tsec\n")
            for i in range(lo, hi):
                f.write(f"a|{i}|{vals[i]}|{int(ts[i].timestamp())}\n")

    def run_once():
        from pyspark.sql import functions as F

        stream = (
            spark.readStream.schema(
                "event_type string, event_id long, value double, tsec long"
            )
            .option("header", True)
            .option("sep", "|")
            .csv(str(indir / "*.csv"))
            .withColumn("ts", F.timestamp_seconds("tsec"))
        )
        q = (
            streaming_zscore(stream, window=30)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "zs_out"))
            .option("checkpointLocation", str(tmp_path / "zs_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_batch("b1.csv", 0, 150)
    run_once()
    write_batch("b2.csv", 150, 300)
    run_once()
    got2 = {
        r["event_id"]: r["zscore"]
        for r in spark.read.parquet(str(tmp_path / "zs_out")).collect()
    }
    assert set(got2) == set(want)
    mism = [e for e in want if got2[e] != want[e]]
    assert not mism, mism[:5]


def test_streaming_gap_monitor(spark, tmp_path):
    """Closed gaps surface exactly as in the batch report (microsecond
    widths), including a gap straddling the micro-batch boundary; an OPEN
    gap fires via event-time timeout once the watermark moves past
    last_ts + gap with no reading."""
    from pyspark.sql import functions as F

    from amazon_lookout_for_equipment_python_sdk_spark.streaming import (
        streaming_gap_monitor,
    )

    base = 1_700_000_000
    # key a: in-batch gap (b1), then cross-batch gap into b2
    b1 = [("a", base), ("a", base + 100), ("a", base + 3000),
          ("b", base), ("b", base + 50)]
    b2 = [("a", base + 7000), ("c", base + 20_000)]
    # key b goes silent: watermark from c's base+20000 reading in b2 pushes
    # past b's last_ts + gap -> open-gap alert for b

    indir = tmp_path / "gap_in"
    indir.mkdir()

    def write_batch(name, evs):
        with open(indir / name, "w") as f:
            f.write("event_type|tsec\n")
            for k, t in evs:
                f.write(f"{k}|{t}\n")

    def run_once():
        stream = (
            spark.readStream.schema("event_type string, tsec long")
            .option("header", True)
            .option("sep", "|")
            .csv(str(indir / "*.csv"))
            .withColumn("ts", F.timestamp_seconds("tsec"))
        )
        q = (
            streaming_gap_monitor(stream, gap_s=1000)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "gap_out"))
            .option("checkpointLocation", str(tmp_path / "gap_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_batch("b1.csv", b1)
    run_once()
    write_batch("b2.csv", b2)
    run_once()

    rows = spark.read.parquet(str(tmp_path / "gap_out")).collect()
    closed = sorted(
        (r["key"], int(r["gap_start"].timestamp()), int(r["gap_end"].timestamp()),
         r["gap_us"])
        for r in rows if not r["open"]
    )
    assert closed == [
        ("a", base + 100, base + 3000, 2900 * 1_000_000),   # in-batch
        ("a", base + 3000, base + 7000, 4000 * 1_000_000),  # cross-batch
    ]
    opened = [(r["key"], int(r["gap_start"].timestamp())) for r in rows if r["open"]]
    assert ("b", base + 50) in opened


def test_streaming_ewma_matches_pandas_and_batch(spark, tmp_path):
    """O(1)-state online EWMA == pandas ewm(adjust=True) across
    micro-batch splits (unit-level FakeState), and == the batch Horner
    operator to truncation error."""
    import numpy as np
    import pandas as pd

    from amazon_lookout_for_equipment_python_sdk_spark.operators.stats import ewma
    from amazon_lookout_for_equipment_python_sdk_spark.streaming.stateful import (
        _ewma_batch,
    )

    rng = np.random.RandomState(3)
    vals = rng.normal(50, 5, 250)

    class FakeState:
        exists = False

        def update(self, v):
            self.exists = True
            self.get = v

    st_ = FakeState()
    got = {}
    for lo in range(0, 250, 90):
        chunk = pd.DataFrame(
            {"event_id": np.arange(lo, min(lo + 90, 250)),
             "value": vals[lo : lo + 90]}
        )
        for out in _ewma_batch(("a",), iter([chunk]), st_, 0.3):
            for eid, z in zip(out["event_id"], out["ewma"]):
                got[int(eid)] = float(z)
    ref = pd.Series(vals).ewm(alpha=0.3, adjust=True).mean()
    for i in range(250):
        assert got[i] == pytest.approx(ref[i], rel=1e-12), i

    # batch operator agreement (to truncation error)
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", int(i), float(v)) for i, v in enumerate(vals)],
        "event_type string, bucket long, avg_value double",
    ).withColumn("bucket_ts", F.timestamp_seconds(F.col("bucket") * 300))
    batch = {
        r["bucket"]: r["ewma"] for r in ewma(df, 0.3, window=64).collect()
    }
    for i in range(250):
        assert got[i] == pytest.approx(batch[i], rel=1e-8), i
