"""A/B: rolling_zscore's 3 sliding-frame aggregates vs running-cumsum +
lag(W) differences (r16).

Spark's SlidingWindowFunctionFrame cannot retract, so each output row
re-aggregates the whole W-row buffer (O(W) per row, W=100 here).  A
running (UNBOUNDED PRECEDING) aggregate is incremental O(1), and
lag(cum, W) is O(1): trailing_sum(i) = cum(i) - cum(i-W).  On exact
integers the difference is bit-identical to the frame aggregate.

Variants:
  frame    — current operator (3 sliding aggregates)
  cumlong  — running long cumsums + lag; overflow bound rows_per_key *
             cents^2 < 2^63 (~9e6 rows/key at |x|<=1e4, scale=100)
  cumdec   — running DECIMAL(38,0) cumsums + lag; no practical bound,
             differences cast back to long exactly

Checks result equality (sorted rows) across variants, then alternates
timed reps.  Usage: python tools/bench_zscore_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.session import get_spark
from amazon_lookout_for_equipment_python_sdk_spark.plans.registry import (
    load,
    qfloor,
)
from amazon_lookout_for_equipment_python_sdk_spark.operators.stats import (
    _cents,
    rolling_zscore,
)

W = 100
THR = 3.0


def _finish(scored):
    zq = qfloor(F.col("zscore"))
    return (
        scored.withColumn("zscore", zq)
        .filter(F.abs(F.col("zscore")) > F.lit(THR))
        .select("event_id", "event_type", "ts", "value", "zscore")
    )


def q_frame(spark, sf_dir):
    return _finish(rolling_zscore(load(spark, sf_dir, "events"), W))


def _cum_variant(spark, sf_dir, decimal: bool):
    df = load(spark, sf_dir, "events")
    wrun = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wlag = Window.partitionBy("event_type").orderBy("ts", "event_id")
    x = _cents(F.col("value"), 100)
    xs = F.coalesce(x, F.lit(0))
    if decimal:
        xs = xs.cast("decimal(38,0)")
    xq = xs * xs
    xn = x.isNotNull().cast("long")
    c = df.withColumn("_cn", F.sum(xn).over(wrun)).withColumn(
        "_cs", F.sum(xs).over(wrun)
    ).withColumn("_cq", F.sum(xq).over(wrun))
    z = lambda col: F.coalesce(F.lag(col, W).over(wlag), F.lit(0).cast(
        "decimal(38,0)" if decimal else "long"
    ))
    n = (F.col("_cn") - F.coalesce(F.lag("_cn", W).over(wlag), F.lit(0))).alias("n")
    c = c.withColumn("_n", F.col("_cn") - F.coalesce(F.lag("_cn", W).over(wlag), F.lit(0)))
    c = c.withColumn("_s", (F.col("_cs") - z(F.col("_cs"))))
    c = c.withColumn("_q", (F.col("_cq") - z(F.col("_cq"))))
    if decimal:
        c = c.withColumn("_s", F.col("_s").cast("long")).withColumn(
            "_q", F.col("_q").cast("long")
        )
    n_, s_, q_ = F.col("_n"), F.col("_s"), F.col("_q")
    var_num = n_ * q_ - s_ * s_
    zexpr = (x * n_ - s_).cast("double") / F.sqrt(
        var_num.cast("double") * n_.cast("double") / (n_ - F.lit(1)).cast("double")
    )
    scored = c.withColumn(
        "zscore", F.when((n_ >= F.lit(W)) & (var_num > F.lit(0)), zexpr)
    ).drop("_cn", "_cs", "_cq", "_n", "_s", "_q")
    return _finish(scored)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark("zscore_ab")
    variants = {
        "frame": lambda d: q_frame(spark, d),
        "cumlong": lambda d: _cum_variant(spark, d, False),
        "cumdec": lambda d: _cum_variant(spark, d, True),
    }
    # equality check at sf0.01 (bigger than smoke, cheap)
    rows = {}
    for k, fn in variants.items():
        rows[k] = sorted(
            (r.event_id, r.event_type, str(r.ts), r.value, r.zscore)
            for r in fn("/root/testdata/sf0.01").collect()
        )
    assert rows["frame"] == rows["cumlong"] == rows["cumdec"], "MISMATCH"
    print(f"equality OK ({len(rows['frame'])} rows)", file=sys.stderr)

    def drain(df):
        df.write.format("noop").mode("overwrite").save()

    for fn in variants.values():  # warm
        drain(fn("/root/testdata/sf0.001"))
        drain(fn(sf_dir))
    runs = {k: [] for k in variants}
    for _ in range(reps):
        for k, fn in variants.items():
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.2)
            t0 = time.time()
            drain(fn(sf_dir))
            runs[k].append(round(time.time() - t0, 3))
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "mins": {k: min(v) for k, v in runs.items()},
                "runs": runs,
                "load_avg_end": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )


if __name__ == "__main__":
    main()
