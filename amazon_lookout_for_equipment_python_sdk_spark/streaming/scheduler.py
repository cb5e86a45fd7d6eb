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

import json
import os
from dataclasses import dataclass, field
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.datetime_utils import iso8601_duration_to_seconds

#: reference file-name timestamp formats (scheduler.py:146-151)
FILENAME_TS_FORMATS = {
    "yyyyMMddHHmmss": "%Y%m%d%H%M%S",
    "yyyy-MM-dd-HH-mm-ss": "%Y-%m-%d-%H-%M-%S",
    "EPOCH": "EPOCH",
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
    delay_offset_minutes: int = 0  # ST3
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
        stream = (
            self.spark.readStream.schema(schema)
            .option("header", True)
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
            .csv(os.path.join(cfg.input_dir, "*.csv"))
            .withColumn("_file", F.input_file_name())
        )
        # ST3: late rows older than slot + delay are not considered
        if cfg.delay_offset_minutes:
            stream = stream.withWatermark(
                "Timestamp", f"{cfg.delay_offset_minutes} minutes"
            )
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

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        cfg = self.config
        # ST2: slot + component parsed from the file-name contract
        base = F.regexp_extract(F.col("_file"), r"([^/]+)\.csv$", 1)
        parsed = (
            batch_df.withColumn(
                "_component", F.regexp_extract(base, rf"^(.+?){cfg.delimiter}", 1)
            )
            .withColumn(
                "_slot_str",
                F.regexp_extract(base, rf"{cfg.delimiter}(\d[\d\-]*)$", 1),
            )
            .withColumn(
                "_slot",
                F.to_timestamp(
                    F.col("_slot_str"),
                    cfg.filename_ts_format
                    if cfg.filename_ts_format != "EPOCH"
                    else None,
                )
                if cfg.filename_ts_format != "EPOCH"
                else F.timestamp_seconds(F.col("_slot_str").cast("long")),
            )
        )
        secs = cfg.frequency_minutes * 60
        # ST4: event-time filter to [slot, slot + freq - 1s]
        in_slot = parsed.filter(
            (F.col("Timestamp") >= F.col("_slot"))
            & (
                F.col("Timestamp")
                <= F.col("_slot") + F.make_interval(secs=F.lit(secs - 1))
            )
        )
        slots = [
            (r["_slot"],)
            for r in parsed.select("_slot").distinct().collect()
            if r["_slot"] is not None
        ]
        for (slot,) in sorted(slots):
            rows = in_slot.filter(F.col("_slot") == F.lit(slot)).drop(
                "_file", "_component", "_slot_str", "_slot"
            )
            n_in = rows.count()
            out_path = os.path.join(
                cfg.output_dir,
                f"results_{format_slot(slot, cfg.filename_ts_format)}.jsonl",
            )
            try:
                scored = self.score_fn(rows)
                recs = [
                    {
                        "timestamp": r["timestamp"].strftime("%Y-%m-%d %H:%M:%S"),
                        "prediction": r["prediction"],
                        **(
                            {"anomaly_score": r["anomaly_score"]}
                            if "anomaly_score" in r.__fields__
                            else {}
                        ),
                        **(
                            {
                                "diagnostics": [
                                    {"name": d["name"], "value": d["value"]}
                                    for d in r["diagnostics"]
                                ]
                            }
                            if r["prediction"] == 1 and r["diagnostics"]
                            else {}
                        ),
                    }
                    for r in scored.collect()
                ]
                with open(out_path, "w") as f:
                    for rec in recs:
                        f.write(json.dumps(rec) + "\n")
                self._executions.append(
                    (
                        cfg.scheduler_name,
                        slot,
                        slot + timedelta(seconds=secs - 1),
                        "SUCCESS",
                        n_in,
                        len(recs),
                        out_path,
                    )
                )
            except Exception as e:  # noqa: BLE001
                self._executions.append(
                    (
                        cfg.scheduler_name,
                        slot,
                        slot + timedelta(seconds=secs - 1),
                        "FAILED",
                        n_in,
                        0,
                        str(e),
                    )
                )

    # -- ST6 audit log --------------------------------------------------------

    def list_inference_executions(
        self,
        execution_status: str | None = None,
        start_time: datetime | None = None,
        end_time: datetime | None = None,
    ) -> DataFrame:
        """Reference list_inference_executions filters (scheduler.py:530-596)."""
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
