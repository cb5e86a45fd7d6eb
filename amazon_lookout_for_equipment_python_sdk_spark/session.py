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


# Native-allocator steady state for the Python workers (the twin of the
# JVM Xms/AlwaysPreTouch pin below, on the C-heap side).  Two measured
# pathologies on virtualized hosts (r15, OPTIMIZATION_r15.md §1b):
#
# * glibc serves any allocation above M_MMAP_THRESHOLD (default 128 KB,
#   dynamic cap 32 MB) with a fresh mmap and RETURNS it to the OS on
#   free — so every Arrow batch / numpy kernel scratch buffer is
#   first-touch page-faulted again on EVERY batch.  Measured on the r15
#   box: touching a fresh 50 MB buffer cost 1-64 s under host memory
#   contention vs 0 ms once the arena recycles it (microbench in
#   OPTIMIZATION_r15.md).  Raising the threshold keeps big-but-bounded
#   scratch in the arena (reused, never unmapped); the trim threshold
#   stops the arena itself from being shaved back between batches.
#   Peak RSS is unchanged — the worker keeps only its own high-water.
#
# * pyarrow's DEFAULT memory pool is jemalloc, whose decay purge gives
#   batch buffers back via MADV_FREE — same refault churn (measured:
#   35 s -> 66 ms across five 50 MB allocations while the system pool
#   sat at ~30 ms flat).  "system" routes Arrow through the (now tamed)
#   glibc arena and is available in every pyarrow build.
#
# Set via os.environ BEFORE the JVM launches so the local-mode Python
# workers (forked from the JVM-spawned daemon) inherit them; the
# spark.executorEnv.* twins below carry the same values to cluster
# executors.  Values are env-overridable deployment knobs, not magic:
# any sane setting beats the default unmap-and-refault churn.
_NATIVE_ALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": os.environ.get(
        "SPARK_GRAFT_MALLOC_MMAP_THRESHOLD", str(512 * 1024 * 1024)
    ),
    "MALLOC_TRIM_THRESHOLD_": os.environ.get(
        "SPARK_GRAFT_MALLOC_TRIM_THRESHOLD", str(1024 * 1024 * 1024)
    ),
    "ARROW_DEFAULT_MEMORY_POOL": os.environ.get(
        "SPARK_GRAFT_ARROW_POOL", "system"
    ),
}


def get_spark(app_name: str = "lookout_spark", cpus: int | None = None) -> SparkSession:
    """Return (or create) the engine's SparkSession."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    driver_mem = os.environ.get("SPARK_DRIVER_MEMORY", "16g")
    for k, v in _NATIVE_ALLOC_ENV.items():
        os.environ.setdefault(k, v)
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
    # cluster twin of the os.environ defaults above (no-op in local mode:
    # local workers inherit the driver process environment directly)
    for k, v in _NATIVE_ALLOC_ENV.items():
        builder = builder.config(f"spark.executorEnv.{k}", os.environ.get(k, v))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
