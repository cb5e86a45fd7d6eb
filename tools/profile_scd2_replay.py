"""Phase-level profile of streaming_scd2_replay (VERDICT r16 item 6).

Replays the registered query's exact steps with per-phase wall timers:
fixture write, stream 1 (epoch 0), stream 2 (epoch 1), final read —
and, inside each stream, the foreachBatch body phases via a wrapped
``streaming_scd2``.  No state store exists on this path (foreachBatch,
stateless), so the item's RocksDB suggestion cannot apply; this profile
finds where the ~2 s actually goes.

Usage: python tools/profile_scd2_replay.py [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.session import get_spark
from amazon_lookout_for_equipment_python_sdk_spark.plans.registry import load
from amazon_lookout_for_equipment_python_sdk_spark.streaming.pipeline import (
    streaming_scd2,
)

SF = "/root/testdata/sf0.1"


def one_replay(spark, tag: str) -> dict:
    t = {}
    work = tempfile.mkdtemp(prefix=f"scd2prof_{tag}_")
    upd_dir = os.path.join(work, "updates")
    hist_path = os.path.join(work, "history")
    ckpt = os.path.join(work, "ckpt")
    t0 = time.time()
    orders = load(spark, SF, "orders")
    u = orders.filter((F.col("o_orderkey") % 3) == 0).select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderstatus").alias("attr"),
        F.timestamp_micros(
            F.unix_micros(F.col("o_orderdate")) + F.col("o_orderkey")
        ).alias("ts"),
    )
    cut = F.to_timestamp(F.lit("1995-07-01"))
    u.filter(F.col("ts") < cut).write.parquet(upd_dir)
    t["fixture_epoch0_write"] = time.time() - t0
    t0 = time.time()
    stream = spark.readStream.schema(u.schema).parquet(upd_dir)
    q = streaming_scd2(stream, hist_path, ckpt, keys=["k"], attrs=["attr"])
    q.awaitTermination()
    t["stream_epoch0"] = time.time() - t0
    t0 = time.time()
    u.filter(F.col("ts") >= cut).write.mode("append").parquet(upd_dir)
    t["fixture_epoch1_write"] = time.time() - t0
    t0 = time.time()
    stream = spark.readStream.schema(u.schema).parquet(upd_dir)
    q = streaming_scd2(stream, hist_path, ckpt, keys=["k"], attrs=["attr"])
    q.awaitTermination()
    t["stream_epoch1"] = time.time() - t0
    t0 = time.time()
    n = spark.read.parquet(hist_path).count()
    t["final_read"] = time.time() - t0
    t["total"] = sum(t.values())
    t["_rows"] = n
    t["_hist_files"] = len(
        [f for f in os.listdir(hist_path) if f.endswith(".parquet")]
    )
    shutil.rmtree(work, ignore_errors=True)
    return t


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("scd2prof")
    one_replay(spark, "warm")  # warmup
    for r in range(reps):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.2)
        t = one_replay(spark, f"r{r}")
        print(
            "  ".join(
                f"{k}={v:.3f}" if isinstance(v, float) else f"{k}={v}"
                for k, v in t.items()
            )
        )


if __name__ == "__main__":
    main()
