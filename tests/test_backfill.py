"""Incremental partition recompute (sources/backfill.py)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.sources.backfill import (
    incremental_recompute,
)


def _write_src(spark, path, days):
    rows = [(d, i, float(i * 2)) for d in days for i in range(10)]
    (
        spark.createDataFrame(rows, "day string, k long, v double")
        .repartition(1)
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )


def _xform(df):
    return df.groupBy("day").agg(F.sum("v").alias("total"))


def test_initial_build_then_noop(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write_src(spark, src, ["d1", "d2", "d3"])
    r1 = incremental_recompute(spark, src, dst, _xform, "day")
    assert r1["recomputed"] == ["d1", "d2", "d3"] and not r1["skipped"]
    got = {r["day"]: r["total"] for r in spark.read.parquet(dst).collect()}
    assert got == {"d1": 90.0, "d2": 90.0, "d3": 90.0}
    # unchanged source -> full no-op
    r2 = incremental_recompute(spark, src, dst, _xform, "day")
    assert r2["recomputed"] == [] and r2["skipped"] == ["d1", "d2", "d3"]


def test_changed_partition_recomputes_only_itself(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write_src(spark, src, ["d1", "d2"])
    incremental_recompute(spark, src, dst, _xform, "day")
    # rewrite d2 with different data (mtime/size change)
    time.sleep(0.01)
    (
        spark.createDataFrame(
            [("d2", i, 100.0) for i in range(5)], "day string, k long, v double"
        )
        .repartition(1)
        .write.mode("overwrite")
        .parquet(src + "/day=d2")
    )
    calls = []

    def tracking_xform(df):
        calls.append(sorted(r["day"] for r in df.select("day").distinct().collect()))
        return _xform(df)

    r = incremental_recompute(spark, src, dst, tracking_xform, "day")
    assert r["recomputed"] == ["d2"] and r["skipped"] == ["d1"]
    assert calls == [["d2"]]  # transform saw ONLY the changed partition
    got = {r_["day"]: r_["total"] for r_ in spark.read.parquet(dst).collect()}
    assert got == {"d1": 90.0, "d2": 500.0}


def test_removed_partition_is_deleted(spark, tmp_path):
    import shutil

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write_src(spark, src, ["d1", "d2"])
    incremental_recompute(spark, src, dst, _xform, "day")
    shutil.rmtree(src + "/day=d2")
    r = incremental_recompute(spark, src, dst, _xform, "day")
    assert r["removed"] == ["d2"]
    got = {r_["day"] for r_ in spark.read.parquet(dst).collect()}
    assert got == {"d1"}


def test_transform_must_keep_partition_column(spark, tmp_path):
    import pytest

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write_src(spark, src, ["d1"])
    with pytest.raises(ValueError, match="partition column"):
        incremental_recompute(
            spark, src, dst, lambda df: df.select("k"), "day"
        )
