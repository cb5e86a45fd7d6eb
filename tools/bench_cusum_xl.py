"""A/B the cusum plain form vs its chunked twin on the cusum_xl fixture
(tools/gen_cusum_xl.py) — the measured point behind CUSUM_BUDGET_ROWS
(r10 verdict #3).

Protocol: BASELINE.md decade protocol — clearCache + double GC between
reps, min-of-N (SPARK_GRAFT_CUSUM_REPS, default 2 at this volume),
un-prunable max(cusum) drain (NOT count — the r9 elision artifact this
tool exists to correct), 48g heap recommended at 50M rows/key so the
plain side's one-task sort reflects cluster per-task memory rather than
local spill artifacts (the r9 duplicate_spans lesson):

    SPARK_DRIVER_MEMORY=48g python tools/bench_cusum_xl.py
    SPARK_GRAFT_CUSUM_NAME=cusum_20m python tools/bench_cusum_xl.py

Prints one JSON line {"fixture":..., "hot_rows":..., "plain": s,
"chunked": s, "chunked_over_plain": ratio} — ratio < 1 means the twin
won and the budget must drop below this fixture's hot-key size.
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
    stats as st,
)
from amazon_lookout_for_equipment_python_sdk_spark.session import get_spark  # noqa: E402

LOCAL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata"
)
NAME = os.environ.get("SPARK_GRAFT_CUSUM_NAME", "cusum_xl")
REPS = int(os.environ.get("SPARK_GRAFT_CUSUM_REPS", "2"))


def main() -> None:
    spark = get_spark("bench_cusum_xl")
    path = os.path.join(LOCAL, NAME, "events.parquet")
    if not os.path.exists(path):
        raise SystemExit(f"{path} missing — run tools/gen_cusum_xl.py")
    df = spark.read.parquet(path).select(
        "event_type", "event_id", "ts", "value"
    )
    probe = rt.probe_keys(df, "event_type", ts_col="ts")
    print(f"probe: {probe}", file=sys.stderr)
    # the twin geometry the auto router would pick if it routed here,
    # sized from the WINDOW budget so each (key,bucket) task holds a
    # sortable slice regardless of where the real crossover lands
    span = rt._bucket_span_s(probe, rt.session_budget_rows(spark))

    variants = {
        "plain": lambda: st.cusum_reflected(df),
        "chunked": lambda: st.cusum_reflected_chunked(df, bucket_span_s=span),
    }

    def bench(make):
        ts = []
        for _ in range(REPS):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.2)
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            make().select(F.max("cusum")).collect()
            ts.append(time.time() - t0)
            print(f"  rep {ts[-1]:.1f}s", file=sys.stderr)
        return round(min(ts), 2)

    out = {"fixture": NAME, "hot_rows": probe.max_key_rows}
    for name, make in variants.items():
        print(f"{name}...", file=sys.stderr)
        out[name] = bench(make)
    out["chunked_over_plain"] = round(out["chunked"] / out["plain"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
