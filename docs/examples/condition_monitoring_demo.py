"""Runnable tour of the condition-monitoring layer on the bundled testdata.

    python docs/examples/condition_monitoring_demo.py [sf_dir]

Walks the statistical monitoring path a fleet-health job takes over the
events stream: rolling z-score point outliers -> CUSUM mean-drift ->
robust MAD outliers -> seasonal hour-of-day baselines -> cross-signal
Spearman structure -> sensor-outage gaps -> the Mahalanobis T²
multivariate monitor over the pivoted signal matrix.  Every step is a
lazy DataFrame; the same composition runs unchanged on a cluster.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.ml.mahalanobis import (
    fit_mahalanobis,
)
from amazon_lookout_for_equipment_python_sdk_spark.operators import stats as st
from amazon_lookout_for_equipment_python_sdk_spark.plans.registry import load
from amazon_lookout_for_equipment_python_sdk_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("condition-monitoring-demo", cpus=4)
    events = load(spark, sf_dir, "events")

    print("== rolling z-score outliers (|z| > 3 vs trailing 100) ==")
    z = st.rolling_zscore(events, 100)
    z.filter(F.abs("zscore") > 3).select(
        "event_type", "ts", "value", F.round("zscore", 2).alias("z")
    ).orderBy(F.abs(F.col("zscore")).desc()).show(5)

    print("== CUSUM drift (reflected-walk closed form) ==")
    st.cusum_reflected(events).groupBy("event_type").agg(
        F.round(F.max("cusum"), 1).alias("max_cusum")
    ).orderBy("event_type").show()

    print("== Spearman structure between signals (5-min resample) ==")
    agg = events.groupBy(
        "event_type",
        F.timestamp_seconds(
            F.floor(F.unix_timestamp("ts") / 300) * 300
        ).alias("bucket_ts"),
    ).agg(F.avg("value").alias("avg_value"))
    st.spearman_pairs(agg).orderBy(F.abs(F.col("rho")).desc()).show(5)

    print("== Mahalanobis T² on the pivoted signal matrix ==")
    # daily buckets: sparse small-SF data rarely fills all 5 signals in
    # a short slot; the monitor needs complete vectors (see docstring)
    daily = events.groupBy(
        "event_type",
        F.timestamp_seconds(
            F.floor(F.unix_timestamp("ts") / 86400) * 86400
        ).alias("bucket_ts"),
    ).agg(F.avg("value").alias("avg_value"))
    wide = (
        daily.groupBy("bucket_ts")
        .pivot("event_type")
        .agg(F.first("avg_value"))
        .dropna()
    )
    tags = [c for c in wide.columns if c != "bucket_ts"]
    model = fit_mahalanobis(wide, tags=tags, ts_col="bucket_ts")
    scored = model.transform(wide)
    n_alarm = scored.filter("anomaly").count()
    print(
        f"signals={tags} n={model.n_rows} "
        f"threshold={model.threshold:.2f} alarms={n_alarm}"
    )
    scored.filter("anomaly").select(
        "bucket_ts", F.round("d2", 1).alias("d2")
    ).orderBy(F.desc("d2")).show(3)


if __name__ == "__main__":
    main()
