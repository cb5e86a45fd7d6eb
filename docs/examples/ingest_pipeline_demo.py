"""Runnable tour of the ingest / table-maintenance layer.

    python docs/examples/ingest_pipeline_demo.py [sf_dir]

The daily-pipeline shapes: data-quality gate with quarantine ->
changelog compaction -> SCD-1 upsert -> SCD-2 history -> incremental
partition backfill -> small-files compaction.  Every step is the
operator the engine ships; temp dirs hold the table state.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.operators import dq
from amazon_lookout_for_equipment_python_sdk_spark.operators.merge import (
    cdc_latest,
    merge_upsert,
    scd2_apply,
)
from amazon_lookout_for_equipment_python_sdk_spark.plans.registry import load
from amazon_lookout_for_equipment_python_sdk_spark.session import get_spark
from amazon_lookout_for_equipment_python_sdk_spark.sources.backfill import (
    incremental_recompute,
)
from amazon_lookout_for_equipment_python_sdk_spark.sources.sinks import (
    compact_table,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("ingest-demo", cpus=4)
    events = load(spark, sf_dir, "events")
    customer = load(spark, sf_dir, "customer")

    print("== 1. expectations gate (clean / quarantine split) ==")
    rules = [
        dq.not_null("event_id"),
        dq.in_range("value", 0.0, 10000.0),
        dq.accepted_values(
            "event_type", ["click", "view", "purchase", "signup", "error"]
        ),
    ]
    clean, bad = dq.quarantine_split(events, rules)
    print(f"clean={clean.count()} quarantined={bad.count()}")
    dq.check(events, rules + [dq.unique("event_id")]).show()

    print("== 2. changelog compaction + SCD-1 upsert ==")
    latest = cdc_latest(clean, ["user_id", "event_type"], tiebreak_col="event_id")
    print("latest state rows:", latest.count())
    dim = customer.select("c_custkey", "c_mktsegment")
    updates = dim.limit(20).withColumn("c_mktsegment", F.lit("VIP"))
    merged = merge_upsert(dim, updates, ["c_custkey"])
    merged.groupBy("c_mktsegment").count().orderBy("c_mktsegment").show()

    print("== 3. SCD-2 history fold ==")
    hist = dim.select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("attr"),
        F.to_timestamp(F.lit("2024-01-01")).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    upd = updates.select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("attr"),
        F.to_timestamp(F.lit("2024-06-01")).alias("ts"),
    )
    h2 = scd2_apply(hist, upd, ["k"], ["attr"])
    h2.groupBy(F.col("valid_to").isNull().alias("current")).count().show()

    with tempfile.TemporaryDirectory() as tmp:
        print("== 4. incremental partition backfill ==")
        src = os.path.join(tmp, "src")
        (
            events.withColumn("day", F.to_date("ts").cast("string"))
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(src)
        )
        dst = os.path.join(tmp, "daily")
        rep = incremental_recompute(
            spark,
            src,
            dst,
            lambda df: df.groupBy("day").agg(F.count("*").alias("n")),
            "day",
        )
        print(
            f"first build: {len(rep['recomputed'])} partitions;",
            "rerun:",
            incremental_recompute(
                spark, src, dst,
                lambda df: df.groupBy("day").agg(F.count("*").alias("n")),
                "day",
            ),
        )

        print("== 5. small-files compaction ==")
        frag = os.path.join(tmp, "frag")
        events.repartition(24).write.parquet(frag)
        print(compact_table(spark, frag, target_file_mb=128))


if __name__ == "__main__":
    main()
