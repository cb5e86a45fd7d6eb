"""Inference scheduler on Structured Streaming (SURVEY ST1-ST8).

The reference's scheduler is a remote cron micro-batch engine
(scheduler.py): every ``DataUploadFrequency`` it wakes, looks for one CSV
per component named ``{component}{delim}{strftime(slot)}.csv``
(scheduler.py:139-170, 196-209), waits up to ``DataDelayOffsetInMinutes``
for late files (scheduler.py:355-357), keeps only rows whose event time
falls in ``[slot_start, slot_start + freq - 1s]`` (docs/userguide.rst:
222-224), scores the batch, and writes one JSON-lines result file.

Spark mapping:
- ST1 tumbling processing-time trigger  -> ``trigger(processingTime=...)``
  (tests use ``availableNow`` for determinism);
- ST2 slot discovery by file name       -> file source + parse component /
  slot out of ``input_file_name()``;
- ST3 late-data allowance               -> ``withWatermark`` on event time
  (late rows beyond the allowance are dropped by the slot filter);
- ST4 in-file event-time filter         -> ``ts BETWEEN slot AND slot_end``;
- ST5 per-batch scoring                 -> ``foreachBatch(score_fn -> json)``;
- ST6 execution audit                   -> per-batch rows appended to an
  executions log (status SUCCESS / FAILED, slot, counts);
- ST7 lifecycle                         -> create/start/stop/delete with
  status strings matching the reference enum;
- ST8 replay generator                  -> batch job: shift history to
  'now', chunk by frequency, emit slot CSVs, record empty slots.
"""

from __future__ import annotations

import glob
import html as _html
import os
import re
import shutil
from dataclasses import dataclass, field
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.datetime_utils import (
    iso8601_duration_to_seconds,
    parse_tz_offset_minutes,
)

#: reference file-name timestamp formats (scheduler.py:146-151)
FILENAME_TS_FORMATS = {
    "yyyyMMddHHmmss": "%Y%m%d%H%M%S",
    "yyyy-MM-dd-HH-mm-ss": "%Y-%m-%d-%H-%M-%S",
    "EPOCH": "EPOCH",
}

#: anchored slot-stamp regex per format, so a delimiter that also appears
#: inside the timestamp (e.g. '-' with yyyy-MM-dd-HH-mm-ss) or inside a
#: component name can never mis-split the file name
_SLOT_STAMP_RE = {
    "yyyyMMddHHmmss": r"\d{14}",
    "yyyy-MM-dd-HH-mm-ss": r"\d{4}-\d{2}-\d{2}-\d{2}-\d{2}-\d{2}",
    "EPOCH": r"\d+",
}


# --- slot math (pure, unit-tested; reference scheduler.py:153-164) ----------


def slot_bounds_for(ts: datetime, frequency_minutes: int) -> tuple[datetime, datetime]:
    """Floor ``ts`` to the frequency; end = start + freq - 1s."""
    start = ts - timedelta(
        minutes=ts.minute % frequency_minutes,
        seconds=ts.second,
        microseconds=ts.microsecond,
    )
    return start, start + timedelta(minutes=frequency_minutes, seconds=-1)


def next_wakeup(now: datetime, frequency_minutes: int) -> datetime:
    """First slot boundary strictly after ``now`` (reference
    scheduler.py:153-162)."""
    start, _ = slot_bounds_for(now, frequency_minutes)
    return start + timedelta(minutes=frequency_minutes)


def format_slot(slot: datetime, fmt: str = "yyyyMMddHHmmss") -> str:
    strf = FILENAME_TS_FORMATS[fmt]
    if strf == "EPOCH":
        # naive slots are UTC wall time everywhere in this engine; a bare
        # .timestamp() would shift the epoch by the driver's UTC offset
        from datetime import timezone

        if slot.tzinfo is None:
            slot = slot.replace(tzinfo=timezone.utc)
        return str(int(slot.timestamp()))
    return slot.strftime(strf)


def expected_filenames(
    components: list[str],
    slot: datetime,
    delimiter: str = "_",
    fmt: str = "yyyyMMddHHmmss",
) -> list[str]:
    """ST2 — the exact file set the scheduler looks for at a wakeup
    (reference scheduler.py:196-209 report)."""
    stamp = format_slot(slot, fmt)
    return [f"{c}{delimiter}{stamp}.csv" for c in sorted(components)]


# --- config + lifecycle ------------------------------------------------------


@dataclass
class SchedulerConfig:
    """Mirror of create_inference_scheduler_request (scheduler.py:314-406)."""

    scheduler_name: str
    input_dir: str
    output_dir: str
    components: list[str]
    tags: list[str]  # sensor columns (excluding Timestamp)
    frequency: str = "PT5M"  # ST1; {PT5M, PT10M, PT15M, PT30M, PT1H}
    #: ST3 advisory: our file source gives an UNBOUNDED late allowance
    #: (files for an already-scored slot are appended whenever they land),
    #: which is strictly more permissive than the reference's wait-then-
    #: give-up; the knob feeds the inspection report's documented behavior
    delay_offset_minutes: int = 0
    timezone_offset: str = "+00:00"
    delimiter: str = "_"
    filename_ts_format: str = "yyyyMMddHHmmss"

    status: str = field(default="NOT_CREATED", init=False)

    @property
    def frequency_minutes(self) -> int:
        allowed = {"PT5M", "PT10M", "PT15M", "PT30M", "PT1H"}
        if self.frequency not in allowed:
            raise ValueError(
                f"frequency must be one of {sorted(allowed)}, got {self.frequency}"
            )
        return iso8601_duration_to_seconds(self.frequency) // 60


EXECUTION_SCHEMA = (
    "scheduler string, slot_start timestamp, slot_end timestamp, "
    "status string, n_input bigint, n_scored bigint, output string"
)


class InferenceScheduler:
    """ST7 lifecycle around a Structured Streaming query."""

    def __init__(self, spark: SparkSession, config: SchedulerConfig, score_fn):
        """``score_fn(batch_wide_df) -> DataFrame`` with columns
        (timestamp, prediction, anomaly_score, diagnostics)."""
        self.spark = spark
        self.config = config
        self.score_fn = score_fn
        self.query = None
        self._executions: list[tuple] = []

    # -- create/start/stop/delete (reference scheduler.py:408-512) ----------

    def create(self) -> None:
        if self.config.status not in ("NOT_CREATED",):
            raise RuntimeError(f"scheduler exists (status={self.config.status})")
        os.makedirs(self.config.output_dir, exist_ok=True)
        self.config.status = "STOPPED"

    def start(self, available_now: bool = False) -> None:
        if self.config.status == "NOT_CREATED":
            raise RuntimeError("create() the scheduler first")
        cfg = self.config
        schema = T.StructType(
            [T.StructField("Timestamp", T.TimestampType(), True)]
            + [T.StructField(t, T.DoubleType(), True) for t in cfg.tags]
        )
        # enforceSchema=False makes Spark VALIDATE the CSV header against
        # the schema's field names — without it, a user-supplied tag order
        # differing from the files' column order silently swaps sensor
        # values (positional binding), scoring every signal with the wrong
        # statistics while reporting SUCCESS
        stream = (
            self.spark.readStream.schema(schema)
            .option("header", True)
            .option("enforceSchema", False)
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
            .csv(os.path.join(cfg.input_dir, "*.csv"))
            .withColumn("_file", F.input_file_name())
        )
        # ST3 (DataDelayOffsetInMinutes): with a foreachBatch sink and no
        # stateful operator a watermark would be a no-op, so the engine's
        # late allowance is UNBOUNDED instead — a file landing after its
        # slot was already scored is delivered by the file source in a
        # later micro-batch and its rows are APPENDED to the slot's
        # results file (never an overwrite), with a second audit row
        # recording the catch-up run.  delay_offset_minutes is advisory
        # (inspection report); see SchedulerConfig.
        writer = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option(
                "checkpointLocation", os.path.join(cfg.output_dir, "_checkpoint")
            )
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(
                processingTime=f"{cfg.frequency_minutes * 60} seconds"
            )
        self.query = writer.start()
        cfg.status = "RUNNING"

    def stop(self) -> None:
        if self.query is not None:
            self.config.status = "STOPPING"
            self.query.stop()
            self.query = None
        self.config.status = "STOPPED"

    def delete(self) -> None:
        # parity: delete requires STOPPED (scheduler.py:504-510)
        if self.config.status == "RUNNING":
            raise RuntimeError("stop the scheduler before deleting it")
        self.config.status = "NOT_CREATED"

    def await_termination(self, timeout: int | None = None) -> None:
        if self.query is not None:
            self.query.awaitTermination(timeout)

    # -- per-batch processing (ST2+ST4+ST5) ----------------------------------

    def _parse_filenames(self, batch_df: DataFrame) -> DataFrame:
        """ST2: component + slot parsed from the file-name contract, with the
        delimiter regex-escaped and the stamp anchored to its format's exact
        shape (a '-' delimiter with yyyy-MM-dd-HH-mm-ss must not mis-split).
        F3: stamps are wall-time in the configured InputTimeZoneOffset
        (scheduler.py:385-386; dataset.py:534 stamps file names in local
        time) -> UTC slot = stamp - offset.  EPOCH stamps are absolute
        already, no offset applies."""
        cfg = self.config
        pat = (
            rf"^(.+){re.escape(cfg.delimiter)}"
            rf"({_SLOT_STAMP_RE[cfg.filename_ts_format]})\.csv$"
        )
        base = F.regexp_extract(F.col("_file"), r"([^/]+)$", 1)
        parsed = batch_df.withColumn(
            "_component", F.regexp_extract(base, pat, 1)
        ).withColumn("_slot_str", F.regexp_extract(base, pat, 2))
        if cfg.filename_ts_format == "EPOCH":
            slot = F.timestamp_seconds(F.col("_slot_str").cast("long"))
        else:
            slot = F.to_timestamp(F.col("_slot_str"), cfg.filename_ts_format)
            offset_min = parse_tz_offset_minutes(cfg.timezone_offset)
            if offset_min:
                slot = slot - F.make_interval(mins=F.lit(offset_min))
        return parsed.withColumn("_slot", slot)

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """ST4+ST5 per wakeup: event-time filter each discovered slot, score
        it, and write its JSON-lines results — all JVM-side.  The only
        driver-side collect is the per-slot metadata aggregate (#slots rows);
        result rows are serialized with ``to_json`` and written by Spark,
        then renamed/appended into the per-slot contract file (the same
        metadata-only rename trick as sinks.write_inference_chunks)."""
        cfg = self.config
        parsed = self._parse_filenames(batch_df)
        secs = cfg.frequency_minutes * 60
        in_slot_cond = (F.col("Timestamp") >= F.col("_slot")) & (
            F.col("Timestamp") <= F.col("_slot") + F.make_interval(secs=F.lit(secs - 1))
        )
        # unparseable file names (wrong delimiter/stamp format) must not
        # vanish silently — record a FAILED audit row naming the files
        bad_files = [
            r["_file"]
            for r in parsed.filter(F.col("_slot").isNull())
            .select("_file")
            .distinct()
            .collect()
        ]
        if bad_files:
            self._record_execution(
                None,
                secs,
                "FAILED",
                0,
                0,
                f"unparseable file names: {sorted(bad_files)[:5]}",
            )
        # per-slot metadata (tiny: one row per slot in this batch)
        slot_meta = (
            parsed.filter(F.col("_slot").isNotNull())
            .groupBy("_slot", "_slot_str")
            .agg(F.count(F.when(in_slot_cond, 1)).alias("n_in"))
            .collect()
        )
        for meta in sorted(slot_meta, key=lambda r: r["_slot"]):
            slot, stamp, n_in = meta["_slot"], meta["_slot_str"], meta["n_in"]
            rows = (
                parsed.filter((F.col("_slot") == F.lit(slot)) & in_slot_cond)
                .drop("_file", "_component", "_slot_str", "_slot")
            )
            out_path = os.path.join(cfg.output_dir, f"results_{stamp}.jsonl")
            try:
                n_scored = self._write_slot_results(rows, out_path, batch_id, stamp)
                self._record_execution(
                    slot, secs, "SUCCESS", n_in, n_scored, out_path
                )
            except Exception as e:  # noqa: BLE001
                self._record_execution(slot, secs, "FAILED", n_in, 0, str(e))

    def _record_execution(
        self, slot, secs: int, status: str, n_in: int, n_scored: int, output: str
    ) -> None:
        """ST6: append the execution row in memory AND write-through to the
        durable audit file, so list_inference_executions survives driver
        restarts (the reference's audit is server-backed)."""
        import json as _json

        end = slot + timedelta(seconds=secs - 1) if slot is not None else None
        row = (
            self.config.scheduler_name,
            slot,
            end,
            status,
            n_in,
            n_scored,
            output,
        )
        self._executions.append(row)
        fmt = lambda t: t.strftime("%Y-%m-%d %H:%M:%S") if t else None  # noqa: E731
        with open(self._audit_path(), "a") as f:
            f.write(
                _json.dumps(
                    {
                        "scheduler": row[0],
                        "slot_start": fmt(slot),
                        "slot_end": fmt(end),
                        "status": status,
                        "n_input": n_in,
                        "n_scored": n_scored,
                        "output": output,
                    }
                )
                + "\n"
            )

    def _audit_path(self) -> str:
        # no leading underscore: Spark's file readers skip _-prefixed
        # files as hidden metadata, which would make the audit unreadable
        return os.path.join(self.config.output_dir, "audit-log.jsonl")

    def _write_slot_results(
        self, rows: DataFrame, out_path: str, batch_id: int, stamp: str
    ) -> int:
        """Score one slot and write/append its JSON-lines file.  Record shape
        (scheduler.py:619-650): timestamp, prediction, optional
        anomaly_score, diagnostics only on prediction==1.  Rows stay in the
        JVM end-to-end; the driver only moves the finished part file."""
        scored = self.score_fn(rows)
        cols = [
            F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss").alias("timestamp"),
            F.col("prediction"),
        ]
        if "anomaly_score" in scored.columns:
            cols.append(F.col("anomaly_score"))
        if "diagnostics" in scored.columns:
            # null diagnostics (prediction==0) vanish via ignoreNullFields
            cols.append(
                F.when(F.col("prediction") == 1, F.col("diagnostics")).alias(
                    "diagnostics"
                )
            )
        lines = scored.select(
            F.to_json(
                F.struct(*cols), {"ignoreNullFields": "true"}
            ).alias("value")
        )
        staging = os.path.join(
            self.config.output_dir, f"_staging_{batch_id}_{stamp}"
        )
        lines.coalesce(1).write.mode("overwrite").text(staging)
        # replay idempotency: foreachBatch is at-least-once, so a naive
        # append would duplicate rows when a crashed batch re-runs.  Each
        # batch owns an immutable per-slot part file (overwritten on
        # replay), and the slot's contract file is rebuilt from all parts
        # — re-running any batch yields byte-identical results.
        parts_dir = os.path.join(self.config.output_dir, "_parts", stamp)
        os.makedirs(parts_dir, exist_ok=True)
        batch_part = os.path.join(parts_dir, f"batch-{batch_id:012d}.jsonl")
        n_scored = 0
        with open(batch_part, "wb") as fout:
            for p in sorted(glob.glob(os.path.join(staging, "part-*"))):
                with open(p, "rb") as fin:
                    data = fin.read()
                n_scored += data.count(b"\n")
                fout.write(data)
        shutil.rmtree(staging)
        with open(out_path, "wb") as fout:
            for p in sorted(glob.glob(os.path.join(parts_dir, "batch-*.jsonl"))):
                with open(p, "rb") as fin:
                    fout.write(fin.read())
        return n_scored

    # -- ST6 audit log --------------------------------------------------------

    def list_inference_executions(
        self,
        execution_status: str | None = None,
        start_time: datetime | None = None,
        end_time: datetime | None = None,
    ) -> DataFrame:
        """Reference list_inference_executions filters (scheduler.py:530-596).
        Reads the durable audit file when present (it outlives driver
        restarts); falls back to the in-memory rows otherwise."""
        audit = self._audit_path()
        if os.path.exists(audit):
            df = (
                self.spark.read.schema(EXECUTION_SCHEMA)
                .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
                .json(audit)
            )
        else:
            df = self.spark.createDataFrame(self._executions, EXECUTION_SCHEMA)
        if execution_status:
            df = df.filter(F.col("status") == execution_status)
        if start_time:
            df = df.filter(F.col("slot_start") >= F.lit(start_time))
        if end_time:
            df = df.filter(F.col("slot_end") <= F.lit(end_time))
        return df


# --- ST8: replay generator ---------------------------------------------------


def generate_replay_data(
    df_long: DataFrame,
    out_dir: str,
    start_at: datetime,
    frequency_minutes: int = 5,
    duration_minutes: int = 60,
    delimiter: str = "_",
) -> dict:
    """Shift the tail of historical data so it ends 'now', chunk it by the
    upload frequency, emit per-slot component CSVs, and report empty slots
    as failures (reference dataset.py:420-556, empty tracking 539-551)."""
    from ..sources.sinks import write_inference_chunks

    bounds = df_long.agg(F.max("ts").alias("mx")).collect()[0]
    # shift so history ends at start_at - 1s: nothing spills into the slot
    # that begins at start_at (the replay window is [start_at - duration,
    # start_at))
    shift_s = int((start_at - timedelta(seconds=1) - bounds["mx"]).total_seconds())
    shifted = df_long.select(
        (F.col("ts") + F.make_interval(secs=F.lit(shift_s))).alias("timestamp"),
        F.col("component"),
        F.col("tag").alias("tagname"),
        "value",
    ).filter(
        F.col("timestamp")
        >= F.lit(start_at - timedelta(minutes=duration_minutes))
    )
    written = write_inference_chunks(
        shifted, out_dir, frequency_minutes=frequency_minutes, delimiter=delimiter
    )
    components = [
        r[0] for r in df_long.select("component").distinct().collect()
    ]
    slots = []
    t = slot_bounds_for(
        start_at - timedelta(minutes=duration_minutes), frequency_minutes
    )[0]
    while t < start_at:
        slots.append(t)
        t += timedelta(minutes=frequency_minutes)
    expected = {
        os.path.join(out_dir, name)
        for s in slots
        for name in expected_filenames(components, s, delimiter)
    }
    missing = sorted(expected - set(written))
    return {
        "written": sorted(written),
        "empty_slots": missing,
        "n_slots": len(slots),
        "components": sorted(components),
    }


def prepare_inference_data(
    df_long: DataFrame,
    out_dir: str,
    start_date,
    num_sequences: int = 3,
    frequency_minutes: int = 5,
    now: datetime | None = None,
    delimiter: str = "_",
) -> dict:
    """Reference ``prepare_inference_data`` (dataset.py:242-336): extract
    ``num_sequences`` consecutive ``frequency``-minute windows starting at
    ``start_date``, restamp each window's rows onto the scheduler's
    upcoming wakeup slots (slot i = floor(now) + i*freq; rows inside a
    window are positionally restamped at freq-minute spacing,
    dataset.py:316-323), and write one ``{component}{delim}{stamp}.csv``
    per component per sequence.

    One Spark job end-to-end: window tagging is a column expression,
    positional restamping a per-sequence dense_rank (each sequence holds
    one wakeup's worth of rows, so the per-partition window is tiny), and
    the file-name contract comes from the same staging+rename sink as the
    replay generator.  ``now`` is injectable for deterministic tests.

    NOTE (reference-faithful quirk, dataset.py:316-323): rows inside a
    sequence are restamped at FREQUENCY-minute spacing, which assumes the
    input is already resampled at sampling rate == frequency (the
    reference tutorial's layout).  Feeding finer-grained data produces
    rows outside the slot window, which the scheduler's ST4 filter then
    drops — resample first.
    """
    from ..sources.sinks import write_inference_chunks

    from datetime import timezone

    if isinstance(start_date, str):
        start_date = datetime.fromisoformat(start_date)
    now = now or datetime.now()
    base_tm = slot_bounds_for(now, frequency_minutes)[0]
    secs = frequency_minutes * 60
    # naive datetimes are UTC wall time (matching the UTC Spark session);
    # .timestamp() on a naive value would inject the driver's local offset
    # and desynchronize the extraction window and slot stamps from the data
    start_epoch = int(start_date.replace(tzinfo=timezone.utc).timestamp())
    base_epoch = int(base_tm.replace(tzinfo=timezone.utc).timestamp())

    seq = F.floor((F.unix_timestamp(F.col("ts")) - F.lit(start_epoch)) / secs)
    df = df_long.withColumn("_seq", seq).filter(
        (F.col("_seq") >= 0) & (F.col("_seq") < num_sequences)
    )
    from pyspark.sql import Window

    rn = (
        F.dense_rank().over(Window.partitionBy("_seq").orderBy("ts")) - 1
    )
    out = df.select(
        F.timestamp_seconds(
            F.lit(base_epoch) + (F.col("_seq") + rn) * secs
        ).alias("timestamp"),
        F.col("component"),
        F.col("tag").alias("tagname"),
        "value",
        F.date_format(
            F.timestamp_seconds(F.lit(base_epoch) + F.col("_seq") * secs),
            "yyyyMMddHHmmss",
        ).alias("_slot"),
    )
    written = write_inference_chunks(
        out,
        out_dir,
        frequency_minutes=frequency_minutes,
        delimiter=delimiter,
        slot_col="_slot",
    )
    return {
        "written": sorted(written),
        "slots": [
            format_slot(base_tm + timedelta(minutes=frequency_minutes * i))
            for i in range(num_sequences)
        ],
    }


# --- inspection report (reference scheduler.py:172-276) ----------------------


def build_inspection_report(
    cfg: SchedulerConfig,
    component_columns: dict[str, list[str]] | None = None,
    now: datetime | None = None,
) -> str:
    """Markdown report spelling out the scheduler's behavior: cadence, delay
    allowance, input location, next wakeup, and — per component — the exact
    expected file name plus a row template table (reference
    build_inspection_report, scheduler.py:172-214).

    ``component_columns`` maps component -> column names (Timestamp first);
    defaults to every component sharing ``cfg.tags``.  ``now`` is injectable
    for deterministic tests.
    """
    if component_columns is None:
        component_columns = {c: ["Timestamp", *cfg.tags] for c in cfg.components}
    now = now or datetime.now()
    freq = cfg.frequency_minutes
    slot_start, slot_end = slot_bounds_for(now, freq)
    wakeup = next_wakeup(now, freq)
    stamp = format_slot(slot_start, cfg.filename_ts_format)
    n = len(component_columns)

    lines = [
        f"**SCHEDULER: {cfg.scheduler_name}**\n",
        f"*Scheduler inspection report run at: {now}*\n",
        "Here is the behavior you can expect from this scheduler:\n",
    ]
    if cfg.delay_offset_minutes > 0:
        lines.append(f"* It will wake up every **{freq} minutes**")
        lines.append(
            f"and wait for up to **{cfg.delay_offset_minutes} minute(s)** "
            "for the data to be available.\n"
        )
    else:
        lines.append(f"* It will wake up every **{freq} minutes**.\n")
    lines.append(
        "* It will look for CSV files in the following location "
        f"`{os.path.join(cfg.input_dir, '*.csv')}`.\n"
    )
    lines.append(
        f"* The current time is **{now}** and the next time the scheduler "
        f"will wake up will be **{wakeup}**\n"
    )
    lines.append(
        f"* The dataset associated to this scheduler's model has **{n} "
        "components** in its schema.\n"
    )
    lines.append(
        f"Each time the scheduler wakes up, it expects to find **{n} CSV "
        "files** in the input location, one for each component as defined "
        "in the dataset schema.\n"
    )
    lines.append(
        f"If the scheduler was to wake up at **{wakeup}**, it would look "
        "for the following files:"
    )
    for comp, columns in component_columns.items():
        lines.append(
            f"\n* `{comp}{cfg.delimiter}{stamp}.csv` and this file content "
            "would have to follow this template:"
        )
        table = "\n"
        for col in columns:
            table += " | " + col
        table += "|"
        table += "\n" + "| --- " * len(columns) + "|"
        table += f"\n| {str(slot_start)[:19]}" + "| 0.0 " * (len(columns) - 1) + "|"
        table += "\n" + "| ... " * len(columns) + "|"
        table += f"\n| {str(slot_end)[:19]}" + "| 0.0 " * (len(columns) - 1) + "|"
        lines.append(table)
    return "\n".join(lines)


def export_report_to_html(report_md: str, html_path: str) -> None:
    """Wrap the Markdown report in the reference's standalone HTML shell
    (scheduler.py:216-276).  The reference renders via the ``markdown``
    package; we use it when importable and fall back to an escaped
    ``<pre>`` block so the export never needs an extra dependency."""
    try:
        import markdown  # type: ignore

        body = markdown.markdown(report_md, extensions=["tables"])
    except ImportError:
        body = f"<pre>{_html.escape(report_md)}</pre>"
    shell = (
        "<!DOCTYPE html>\n<html>\n<head>\n<style>\n"
        'body { font-family: Helvetica, Arial, sans-serif; font-size: 14px }\n'
        "table { border-collapse: collapse; font-size: 12px }\n"
        "th { padding: 5px 15px }\n"
        "td { height: 15px; text-align: right }\n"
        "</style>\n</head>\n<body>\n"
        f"{body}\n"
        "</body>\n</html>\n"
    )
    with open(html_path, "w") as f:
        f.write(shell)
