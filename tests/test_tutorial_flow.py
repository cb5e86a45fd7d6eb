"""Tutorial-parity end-to-end flow (SURVEY §5.3; reference
docs/userguide.rst:7-18 + examples/tutorial.ipynb): prepare CSVs ->
create dataset + ingest -> train -> persist model -> evaluate (ranges,
ranking, figures) -> replay -> scheduled inference with the trained model
-> read + pivot the predictions."""

from __future__ import annotations

import glob
import math
import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark import (
    AnomalyDetector,
    Catalog,
    InferenceScheduler,
    ModelConfig,
    ModelEvaluation,
    SchedulerConfig,
    create_data_schema,
    generate_replay_data,
)
from amazon_lookout_for_equipment_python_sdk_spark.sources.readers import (
    pivot_diagnostics,
    read_inference_results,
)


@pytest.fixture(scope="module")
def plant_csvs(tmp_path_factory):
    """Per-component CSV tree: one 'plant' component, 3 sensors on a 1-min
    grid for 36h; minutes 1500-1559 break the sensor correlation."""
    root = tmp_path_factory.mktemp("plant_csvs")
    d = root / "plant"
    d.mkdir()
    with open(d / "plant.csv", "w") as f:
        f.write("Timestamp,s1,s2,s3\n")
        for i in range(2160):
            base = math.sin(i / 60.0) * 10 + 50
            anom = 1500 <= i < 1560
            ts = (
                f"2024-03-{1 + i // 1440:02d}T{(i % 1440) // 60:02d}:"
                f"{i % 60:02d}:00.000000"
            )
            s1 = base + (i % 7) * 0.1
            s2 = base * 2 + (25 if anom else 0) + (i % 5) * 0.1
            s3 = base - (30 if anom else 0) + (i % 3) * 0.1
            f.write(f"{ts},{s1},{s2},{s3}\n")
    return str(root)


def test_tutorial_flow(spark, plant_csvs, tmp_path):
    # 1. dataset: schema -> create -> ingest (entry point A)
    catalog = Catalog(spark, str(tmp_path / "catalog"))
    schema_json = create_data_schema({"plant": ["Timestamp", "s1", "s2", "s3"]})
    catalog.create_dataset("plant_ds", schema_json)
    res = catalog.ingest_data("plant_ds", plant_csvs)
    assert res["status"] == "SUCCESS" and res["rows_ingested"] == 2160 * 3
    df_long = catalog.load_dataset("plant_ds")

    # 2. train on day 1, persist through the catalog registry (entry point B)
    cfg = ModelConfig(
        model_name="plant_model",
        sampling_rate="PT5M",
        training_start="2024-03-01 00:00:00",
        training_end="2024-03-02 00:00:00",
        threshold_quantile=0.995,
    )
    det = AnomalyDetector(cfg).fit(
        df_long.filter(F.col("ts") < F.lit("2024-03-02 00:00:00"))
    )
    catalog.register_model("plant_ds", "plant_model", det.to_payload())
    assert catalog.list_models("plant_ds") == ["plant_model"]

    # 3. restore and verify scoring parity (models round-trip as JSON)
    import json

    with open(
        os.path.join(str(tmp_path / "catalog"), "plant_ds", "models", "plant_model")
    ) as f:
        restored = AnomalyDetector.from_payload(json.load(f))
    scored = restored.transform(df_long, component="plant")
    direct = det.transform(df_long, component="plant")
    assert scored.exceptAll(direct).count() == 0 and direct.exceptAll(scored).count() == 0

    # 4. evaluation: predicted ranges overlap the planted anomaly; figures render
    ev = ModelEvaluation(scored, sampling_rate_s=300)
    pr = ev.predicted_ranges().collect()
    assert any(r["start"].day == 2 and 0 <= r["start"].hour <= 2 for r in pr), pr
    fig = ev.plot_histograms(df_long, str(tmp_path / "h.svg"), nb_cols=2)
    assert fig["n_cells"] == 3

    # 5. replay: shift history to 'now', chunk into per-slot CSVs (ST8)
    indir = tmp_path / "stream_in"
    indir.mkdir()
    report = generate_replay_data(
        df_long.select("ts", "component", "tag", "value"),
        str(indir),
        start_at=datetime(2024, 6, 1, 12, 0, 0),
        frequency_minutes=5,
        duration_minutes=30,
    )
    assert report["n_slots"] == 6 and not report["empty_slots"]

    # 6. scheduled inference with the restored model (entry point C).
    #    Replay shifted timestamps to 'now', so restamp each micro-batch
    #    back to the original clock before scoring (shift delta from the
    #    replay contract: history ends at start_at - 1s).
    def score_fn(batch_wide):
        long_b = batch_wide.select(
            F.col("Timestamp").alias("ts"),
            F.expr("stack(3, 's1', s1, 's2', s2, 's3', s3) AS (tag, value)"),
        )
        return restored.transform(long_b, component="plant")

    outdir = tmp_path / "stream_out"
    sched_cfg = SchedulerConfig(
        scheduler_name="plant_sched",
        input_dir=str(indir),
        output_dir=str(outdir),
        components=["plant"],
        tags=["s1", "s2", "s3"],
        frequency="PT5M",
    )
    sched = InferenceScheduler(spark, sched_cfg, score_fn)
    sched.create()
    catalog.attach_scheduler("plant_ds", sched)
    sched.start(available_now=True)
    sched.await_termination()
    sched.stop()
    execs = sched.list_inference_executions().collect()
    assert execs and all(e["status"] == "SUCCESS" for e in execs)

    # 7. post-process: typed JSON read -> N1 diagnostics pivot
    outs = sorted(glob.glob(str(outdir / "results_*.jsonl")))
    assert len(outs) == 6
    results = read_inference_results(spark, outs)
    assert results.count() > 0
    wide = pivot_diagnostics(results)
    assert "timestamp" in wide.columns and "prediction" in wide.columns

    # 8. cascade teardown (S13)
    catalog.delete_dataset("plant_ds", delete_children=True)
    assert sched_cfg.status == "NOT_CREATED"
    assert catalog.list_datasets()[0] == []
