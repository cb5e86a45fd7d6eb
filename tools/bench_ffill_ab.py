"""A/B the plain forward-fill vs its chunked twin on hot-key fixtures —
the measured evidence behind routing ``ffill_auto`` (r11, the seventh
routed family; the fill inside the FLAGSHIP resample_ffill idiom).

Reuses the cusum_xl fixture family (tools/gen_cusum_xl.py).  The fill
input is the trades-like sparse shape: every 20th row keeps its value,
the rest are nulled and forward-filled per event_type — the plain form
sorts the hot key's whole series on ONE task's window, the twin fans it
over (key, time-bucket) tasks with a broadcast last-non-null carry.

Protocol: BASELINE.md decade protocol — clearCache + double GC between
reps, min-of-N (SPARK_GRAFT_FFILL_REPS, default 2), noop-sink drain
(never a row-count drain — the r11 elision lesson,
tests/test_bench_drains.py):

    python tools/gen_cusum_xl.py && python tools/bench_ffill_ab.py
    SPARK_GRAFT_CUSUM_NAME=cusum_1m python tools/bench_ffill_ab.py

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
REPS = int(os.environ.get("SPARK_GRAFT_FFILL_REPS", "2"))


def main() -> None:
    spark = get_spark("bench_ffill_ab")
    path = os.path.join(LOCAL, NAME, "events.parquet")
    if not os.path.exists(path):
        raise SystemExit(f"{path} missing — run tools/gen_cusum_xl.py")
    ev = spark.read.parquet(path).select(
        "event_type",
        "ts",
        F.when(
            F.pmod(F.col("event_id"), F.lit(20)) == 0, F.col("value")
        ).alias("v"),
    )
    probe = rt.probe_keys(ev, "event_type", ts_col="ts")
    print(f"probe: {probe}", file=sys.stderr)
    span = rt._bucket_span_s(probe, rt.session_budget_rows(spark))

    variants = {
        "plain": lambda: ts_ops.ffill(
            ev, "v", ts_col="ts", key_col="event_type", out_col="filled"
        ),
        "chunked": lambda: ts_ops.ffill_chunked(
            ev, "v", span, ts_col="ts", key_col="event_type",
            out_col="filled",
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
