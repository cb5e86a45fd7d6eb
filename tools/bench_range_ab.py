"""A/B the plain event-time range frame vs its chunked twin on hot-key
fixtures — the measured evidence behind routing ``rolling_range_auto``
(r11, the eighth routed family).

Reuses the cusum_xl fixture family (tools/gen_cusum_xl.py).  The shape
is the registered ``rolling_1h_range_frame`` query's: trailing-1-hour
count + exact-cents sum per event_type, framed on microsecond epochs.
The plain form sorts the hot key's whole series on ONE task's window;
the twin replicates each bucket's last hour into the next bucket as
context and frames within (key, time-bucket) — no join, no carry.

Protocol: BASELINE.md decade protocol — clearCache + double GC between
reps, min-of-N (SPARK_GRAFT_RANGE_REPS, default 2), noop-sink drain
(never a row-count drain — the r11 elision lesson,
tests/test_bench_drains.py):

    python tools/gen_cusum_xl.py && python tools/bench_range_ab.py
    SPARK_GRAFT_CUSUM_NAME=cusum_1m python tools/bench_range_ab.py

Prints one JSON line {"fixture":..., "hot_rows":..., "span_s":...,
"plain": s, "chunked": s, "chunked_over_plain": ratio}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from amazon_lookout_for_equipment_python_sdk_spark.operators import (  # noqa: E402
    routing as rt,
)
from amazon_lookout_for_equipment_python_sdk_spark.operators import (  # noqa: E402
    timeseries as ts_ops,
)
from amazon_lookout_for_equipment_python_sdk_spark.session import get_spark  # noqa: E402

LOCAL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata"
)
NAME = os.environ.get("SPARK_GRAFT_CUSUM_NAME", "cusum_xl")
REPS = int(os.environ.get("SPARK_GRAFT_RANGE_REPS", "2"))
RANGE_S = 3_600


def main() -> None:
    spark = get_spark("bench_range_ab")
    path = os.path.join(LOCAL, NAME, "events.parquet")
    if not os.path.exists(path):
        raise SystemExit(f"{path} missing — run tools/gen_cusum_xl.py")
    ev = spark.read.parquet(path).select(
        "event_type", "event_id", "ts", "value"
    )
    probe = rt.probe_keys(ev, "event_type", ts_col="ts")
    print(f"probe: {probe}", file=sys.stderr)
    span = max(
        rt._bucket_span_s(probe, rt.session_budget_rows(spark)), RANGE_S
    )
    cents = F.round(F.col("value") * 100).cast("long")

    def aggs(w):
        return {
            "n_1h": F.count(F.lit(1)).over(w),
            "sum_1h": F.sum(cents).over(w).cast("double") / F.lit(100.0),
        }

    variants = {
        "plain": lambda: ts_ops.rolling_range(
            ev, RANGE_S, aggs, ts_col="ts", key_col="event_type"
        ),
        "chunked": lambda: ts_ops.rolling_range_chunked(
            ev, RANGE_S, aggs, span, ts_col="ts", key_col="event_type"
        ),
    }

    def bench(make):
        ts = []
        for _ in range(REPS):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.2)
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            make().write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
            print(f"  rep {ts[-1]:.1f}s", file=sys.stderr)
        return round(min(ts), 2)

    out = {
        "fixture": NAME,
        "hot_rows": probe.max_key_rows,
        "span_s": span,
    }
    for name, make in variants.items():
        print(f"{name}...", file=sys.stderr)
        out[name] = bench(make)
    out["chunked_over_plain"] = round(out["chunked"] / out["plain"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
