"""A/B the plain EWMA window vs its chunked twin on hot-key fixtures —
the measured evidence behind routing ``ewma_auto`` (r11, the ninth
routed family).

Reuses the cusum_xl fixture family (tools/gen_cusum_xl.py), EWMA over
the raw per-event_type series (window 64, alpha 0.3 — the registered
ewma_chart geometry; fixture timestamps are unique per key, so no
tiebreak is needed, same as the plain form's ordering contract).

Protocol: BASELINE.md decade protocol — clearCache + double GC between
reps, min-of-N (SPARK_GRAFT_EWMA_REPS, default 2), noop-sink drain
(never a row-count drain — the r11 elision lesson,
tests/test_bench_drains.py):

    python tools/gen_cusum_xl.py && python tools/bench_ewma_ab.py
    SPARK_GRAFT_CUSUM_NAME=cusum_1m python tools/bench_ewma_ab.py

Prints one JSON line {"fixture":..., "hot_rows":..., "span_s":...,
"plain": s, "chunked": s, "chunked_over_plain": ratio}.
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
    stats as st,
)
from amazon_lookout_for_equipment_python_sdk_spark.session import get_spark  # noqa: E402

LOCAL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata"
)
NAME = os.environ.get("SPARK_GRAFT_CUSUM_NAME", "cusum_xl")
REPS = int(os.environ.get("SPARK_GRAFT_EWMA_REPS", "2"))


def main() -> None:
    spark = get_spark("bench_ewma_ab")
    path = os.path.join(LOCAL, NAME, "events.parquet")
    if not os.path.exists(path):
        raise SystemExit(f"{path} missing — run tools/gen_cusum_xl.py")
    ev = spark.read.parquet(path).select("event_type", "ts", "value")
    probe = rt.probe_keys(ev, "event_type", ts_col="ts")
    print(f"probe: {probe}", file=sys.stderr)
    span = rt._bucket_span_s(probe, rt.session_budget_rows(spark))

    variants = {
        "plain": lambda: st.ewma(
            ev, alpha=0.3, window=64, value_col="value",
            order_col="ts", key_col="event_type",
        ),
        "chunked": lambda: st.ewma_chunked(
            ev, alpha=0.3, bucket_span_s=span, window=64,
            value_col="value", order_col="ts", key_col="event_type",
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
