"""Isolated mini-bench of named registered queries under the standard
protocol (warmup at sf0.001, clearCache + double GC between reps,
noop-sink drain, min-of-N) — for quiet-window re-confirmation runs and
per-change A/Bs without paying the full 69-query bench.

Usage: python tools/minibench.py q1 q2 ... [--reps N] [--sf DIR]
Prints one JSON line {"queries": {name: min}, "runs": {name: [reps]},
"load_avg_prelaunch": [...], ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amazon_lookout_for_equipment_python_sdk_spark.session import get_spark  # noqa: E402
from amazon_lookout_for_equipment_python_sdk_spark.plans import queries as q  # noqa: E402


def main() -> None:
    names, reps, sf_dir = [], 5, "/root/testdata/sf0.1"
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    load_prelaunch = [round(x, 2) for x in os.getloadavg()]
    spark = get_spark("minibench")

    def drain(df):
        df.write.format("noop").mode("overwrite").save()

    for n in names:  # warmup
        try:
            drain(q.QUERIES[n](spark, "/root/testdata/sf0.001"))
        except Exception:
            pass
    runs: dict[str, list[float]] = {}
    for n in names:
        rep_times = []
        for _ in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.2)
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            drain(q.QUERIES[n](spark, sf_dir))
            rep_times.append(round(time.time() - t0, 3))
        runs[n] = rep_times
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "reps": reps,
                "queries": {n: min(r) for n, r in runs.items()},
                "runs": runs,
                "load_avg_prelaunch": load_prelaunch,
                "load_avg_end": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )


if __name__ == "__main__":
    main()
