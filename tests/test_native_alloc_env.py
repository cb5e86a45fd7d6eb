"""Pin the native-allocator steady-state plumbing (session.py).

The r15 optimization round measured two allocator pathologies on
virtualized hosts (OPTIMIZATION_r15.md §1b): glibc unmapping-and-
refaulting every >128 KB scratch buffer per batch, and pyarrow's default
jemalloc pool purging batch buffers between uses.  session.get_spark()
now pins both to arena-recycling steady state via process environment
(inherited by local-mode Python workers) plus spark.executorEnv twins
for cluster executors.  These tests pin the plumbing, not the numbers:
the env must reach the live session's workers and the executorEnv confs
must be set, or a refactor could silently drop the fix.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from amazon_lookout_for_equipment_python_sdk_spark.session import (
    _NATIVE_ALLOC_ENV,
)

_KEYS = (
    "MALLOC_MMAP_THRESHOLD_",
    "MALLOC_TRIM_THRESHOLD_",
    "ARROW_DEFAULT_MEMORY_POOL",
)


def test_native_alloc_env_keys_complete():
    assert set(_NATIVE_ALLOC_ENV) == set(_KEYS)
    # thresholds must parse as positive ints (glibc silently ignores
    # malformed values — a typo here would be an invisible regression)
    assert int(_NATIVE_ALLOC_ENV["MALLOC_MMAP_THRESHOLD_"]) > 0
    assert int(_NATIVE_ALLOC_ENV["MALLOC_TRIM_THRESHOLD_"]) > 0


def test_driver_process_env_set_after_get_spark(spark):
    # get_spark ran (session fixture) => the defaults are in the driver
    # process env, where forked local-mode workers inherit them
    for k in _KEYS:
        assert os.environ.get(k), f"{k} not set in driver process env"


def test_executor_env_confs_set(spark):
    for k in _KEYS:
        v = spark.conf.get(f"spark.executorEnv.{k}", None)
        assert v, f"spark.executorEnv.{k} missing"
        assert v == os.environ.get(k)


def test_python_worker_inherits_alloc_env(spark):
    """End to end: a pandas-UDF worker of the live session must see the
    env AND pyarrow must resolve the default pool it names."""
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def probe(s: pd.Series) -> pd.Series:
        import os as _os

        import pyarrow as _pa

        got = "|".join(
            [
                _os.environ.get("MALLOC_MMAP_THRESHOLD_", ""),
                _os.environ.get("ARROW_DEFAULT_MEMORY_POOL", ""),
                _pa.default_memory_pool().backend_name,
            ]
        )
        return pd.Series([got] * len(s))

    rows = (
        spark.range(2)
        .select(probe(F.col("id").cast("string")).alias("e"))
        .distinct()
        .collect()
    )
    assert len(rows) == 1
    thr, pool_env, pool_live = rows[0]["e"].split("|")
    assert thr == os.environ["MALLOC_MMAP_THRESHOLD_"]
    assert pool_env == os.environ["ARROW_DEFAULT_MEMORY_POOL"]
    # the worker's live pyarrow pool must be the one the env names
    # (guard against pyarrow builds that lack the named pool and fall
    # back silently to a purging allocator)
    assert pool_live == pool_env


def test_explicit_user_env_wins(monkeypatch):
    """A user-exported MALLOC_* / ARROW_* var must survive get_spark
    (setdefault semantics) — deployment knob, not an override."""
    import amazon_lookout_for_equipment_python_sdk_spark.session as sess

    monkeypatch.setenv("MALLOC_MMAP_THRESHOLD_", "42424242")
    # simulate the pre-JVM env application path
    for k, v in sess._NATIVE_ALLOC_ENV.items():
        os.environ.setdefault(k, v)
    assert os.environ["MALLOC_MMAP_THRESHOLD_"] == "42424242"
