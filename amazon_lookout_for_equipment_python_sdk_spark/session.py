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
    driver_mem = os.environ.get("SPARK_DRIVER_MEMORY", "16g")
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
        .config("spark.driver.memory", driver_mem)
        # Pin the heap (Xms = Xmx) and fault every page in at JVM start
        # (AlwaysPreTouch).  Without this, any full GC (the bench harness
        # fires one between queries; long-lived engines see them
        # periodically) lets G1 UNCOMMIT the heap back toward the default
        # Xms (~2 GB), and the next query's allocations re-fault the
        # committed-then-released pages.  On virtualized hosts those
        # faults are kernel-side work — measured here at >90% system time
        # across all 32 cores for up to 30 s (r15 profiling:
        # bigram_lm_perplexity reps of 2 s vs 16-32 s in ONE session,
        # eliminated completely by this pin — OPTIMIZATION_r15.md §1).
        # One-time cost: the pre-touch itself at session start, OUTSIDE
        # any per-query timing.  Guide §5 (memory): steady-state heap for
        # a long-running engine; on a cluster the same flags go on the
        # executor JVMs.
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{driver_mem} -XX:+AlwaysPreTouch",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
