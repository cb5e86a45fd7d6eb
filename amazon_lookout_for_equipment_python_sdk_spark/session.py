"""SparkSession factory tuned for this engine.

Local testing runs ``local[N]`` (single JVM); the configs below are chosen so
the same logical plans scale to a multi-executor cluster: AQE on (runtime
coalesce + skew-join handling), shuffle partitions sized to cores locally
(cluster deployments override via ``spark.sql.shuffle.partitions``), Arrow on
for the few Pandas-UDF paths, UTC session timezone (the reference normalizes
everything tz-naive; SURVEY §1.2).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "lookout_spark", cpus: int | None = None) -> SparkSession:
    """Return (or create) the engine's SparkSession."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
