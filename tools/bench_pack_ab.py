"""A/B the pack_documents plain form vs its chunked twin on the
pack_* fixtures (tools/gen_pack_xl.py) — the measured series behind
PACK_BUDGET_ROWS (r12; r11 verdict #4, the serialized-sort-cliff
close).

Protocol: BASELINE.md decade protocol — clearCache + double GC between
reps, min-of-N (SPARK_GRAFT_PACK_REPS, default 2), un-prunable
max(pack_offset)+max(pack_id) drain (the full cumsum lineage must
evaluate — the r11 count-drain elision lesson; tests/test_bench_drains.py
pins this harness).

    python tools/bench_pack_ab.py
    SPARK_GRAFT_PACK_NAME=pack_1m python tools/bench_pack_ab.py

Prints one JSON line {"fixture":..., "hot_rows":..., "plain": s,
"chunked": s, "chunked_over_plain": ratio} — ratio < 1 means the twin
won and the budget must drop below this fixture's hot-group size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from amazon_lookout_for_equipment_python_sdk_spark.operators import (  # noqa: E402
    corpus as cp,
)
from amazon_lookout_for_equipment_python_sdk_spark.operators import (  # noqa: E402
    routing as rt,
)
from amazon_lookout_for_equipment_python_sdk_spark.session import get_spark  # noqa: E402

LOCAL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata"
)
NAME = os.environ.get("SPARK_GRAFT_PACK_NAME", "pack_xl")
REPS = int(os.environ.get("SPARK_GRAFT_PACK_REPS", "2"))
BUDGET_TOKENS = 2048


def main() -> None:
    spark = get_spark("bench_pack_ab")
    path = os.path.join(LOCAL, NAME, "documents.parquet")
    if not os.path.exists(path):
        raise SystemExit(f"{path} missing — run tools/gen_pack_xl.py")
    df = spark.read.parquet(path)
    probe = rt.probe_keys(df, "source", ts_col="doc_id", numeric_axis=True)
    print(f"probe: {probe}", file=sys.stderr)
    span = rt._bucket_span_ids(probe, rt.session_budget_rows(spark))
    print(f"bucket_span_ids: {span}", file=sys.stderr)

    variants = {
        "plain": lambda: cp.pack_documents(df, budget_tokens=BUDGET_TOKENS),
        "chunked": lambda: cp.pack_documents_chunked(
            df, budget_tokens=BUDGET_TOKENS, bucket_span_ids=span
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
            make().select(
                F.max("pack_offset"), F.max("pack_id")
            ).collect()
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
