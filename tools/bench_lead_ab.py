"""A/B the plain lead-pairing / positional-restamp windows vs their
chunked twins on hot-key fixtures — the measured evidence behind
routing ``lead_pairs_auto`` / ``restamp_positional_auto`` (r11, the
fifth/sixth routed families).

Reuses the cusum_xl fixture family (tools/gen_cusum_xl.py: one hot
event_type + two 1/5-sized cold keys, events schema).  Both operators
run keyed by event_type over the full frame — the shape where the
plain form sorts the hot key's entire history on ONE task's window
(lead_pairs: one ``lead``; restamp: one ``row_number``), and the twins
fan it over (key, time-bucket) tasks with a broadcast boundary table.

Protocol: BASELINE.md decade protocol — clearCache + double GC between
reps, min-of-N (SPARK_GRAFT_LEAD_REPS, default 2), noop-sink drain
(materializes every output column; never a row-count drain — the r11
elision lesson, tests/test_bench_drains.py):

    python tools/gen_cusum_xl.py && python tools/bench_lead_ab.py
    SPARK_GRAFT_CUSUM_NAME=cusum_1m python tools/bench_lead_ab.py

Prints one JSON line {"fixture":..., "hot_rows":..., "span_s":...,
"lead_plain": s, "lead_chunked": s, "lead_ratio": chunked/plain,
"restamp_plain": s, "restamp_chunked": s, "restamp_ratio": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
REPS = int(os.environ.get("SPARK_GRAFT_LEAD_REPS", "2"))


def main() -> None:
    spark = get_spark("bench_lead_ab")
    path = os.path.join(LOCAL, NAME, "events.parquet")
    if not os.path.exists(path):
        raise SystemExit(f"{path} missing — run tools/gen_cusum_xl.py")
    ev = spark.read.parquet(path).select("event_type", "event_id", "ts")
    probe = rt.probe_keys(ev, "event_type", ts_col="ts")
    print(f"probe: {probe}", file=sys.stderr)
    span = rt._bucket_span_s(probe, rt.session_budget_rows(spark))

    variants = {
        "lead_plain": lambda: ts_ops.lead_pairs(
            ev, ts_col="ts", key_col="event_type"
        ),
        "lead_chunked": lambda: ts_ops.lead_pairs_chunked(
            ev, span, ts_col="ts", key_col="event_type"
        ),
        "restamp_plain": lambda: ts_ops.restamp_positional(
            ev, "2025-01-01 00:00:00", 60, ts_col="ts",
            key_col="event_type", tiebreak_col="event_id",
        ),
        "restamp_chunked": lambda: ts_ops.restamp_positional_chunked(
            ev, "2025-01-01 00:00:00", 60, span, ts_col="ts",
            key_col="event_type", tiebreak_col="event_id",
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
    out["lead_ratio"] = round(out["lead_chunked"] / out["lead_plain"], 3)
    out["restamp_ratio"] = round(
        out["restamp_chunked"] / out["restamp_plain"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
