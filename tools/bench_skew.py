"""Skew A/B: the documented skew-safe paths vs their plain twins on the
Zipf-skewed fixture (tools/gen_skew.py) and, for contrast, the uniform
sf1 fixture of identical volume.

    python tools/gen_sf1.py && python tools/gen_skew.py
    python tools/bench_skew.py

What the table answers (r8 verdict #3): the skew-safe claims —
sessionize's (key, time-bucket) pre-split, rolling_zscore's chunked
context replication, tfidf's no-vocabulary-broadcast, the LSH posting
caps — were property-tested and decade-measured, but only on
uniform-by-construction fixtures.  Here one user holds ~50% of events,
one event_type ~60%, one source ~50% of docs, and a hot token floods
the shingle space.  A skew-safe path that degrades >2x vs its plain
twin ON THE SKEWED DATA is a broken claim; a plain path that degrades
far more than its twin under skew is the reason the twin exists.

Protocol: BASELINE.md decade protocol (clearCache + double GC,
min-of-3, count drain, local[32] session).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amazon_lookout_for_equipment_python_sdk_spark.session import get_spark  # noqa: E402
from amazon_lookout_for_equipment_python_sdk_spark.plans import queries as q  # noqa: E402

QUERIES = [
    # (plain, skew-safe twin) — None = no twin, measured for degradation
    ("sessionize_events", "sessionize_events_skew"),
    ("rolling_zscore_anomalies", "rolling_zscore_anomalies_chunked"),
    ("cusum_drift_flags", "cusum_drift_flags_chunked"),
    ("asof_join_purchases", "asof_join_purchases_chunked"),
    # r11: the light-rank pair (lead_pairs_chunks operates on deduped
    # hourly buckets — aggregate-sized, skew-insensitive by
    # construction — so the restamp row carries the family's skew
    # evidence)
    ("positional_restamp", "positional_restamp_chunked"),
    # r11: the range-frame pair runs over RAW events (skew-sensitive);
    # the ewma/flagship pairs run over resampled grids — span-bounded,
    # skew-insensitive by construction — and carry no skew row
    ("rolling_1h_range_frame", "rolling_1h_range_frame_chunked"),
    ("tfidf_top_terms", None),
    ("ngram_jaccard_lsh", None),
]

LOCAL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata"
)
# r10: parametrized so the decade-skew extensions (sf10_skew,
# sf30_skew) run through the SAME harness as the sf1 table instead of
# ad-hoc scripts: SPARK_GRAFT_SKEW_PAIR=sf10:sf10_skew,
# SPARK_GRAFT_SKEW_QUERIES=a,b,c (comma list overrides the twin table),
# SPARK_GRAFT_SKEW_REPS=2 (min-of-N; decade protocol uses 2 at sf10+).
_pair = os.environ.get("SPARK_GRAFT_SKEW_PAIR", "sf1:sf1_skew").split(":")
UNIFORM = os.path.join(LOCAL, _pair[0])
SKEWED = os.path.join(LOCAL, _pair[1])
REPS = int(os.environ.get("SPARK_GRAFT_SKEW_REPS", "3"))


def _drain(df) -> None:
    # noop sink, NOT .count() (r11): count lets Catalyst prune aggregate
    # expressions and elide upstream operators — the r9 cusum A/B's
    # plain side compiled to a bare distinct (tools/drain_audit.py; the
    # same fix bench.py got in r6).  The noop write materializes every
    # output column.
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("bench_skew")
    only = os.environ.get("SPARK_GRAFT_SKEW_QUERIES")
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
    else:
        names = [n for pair in QUERIES for n in pair if n]
    for n in names:  # warm-up
        _drain(q.QUERIES[n](spark, "/root/testdata/sf0.001"))

    def min3(name, sf_dir):
        ts = []
        for _ in range(REPS):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.2)
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            _drain(q.QUERIES[name](spark, sf_dir))
            ts.append(time.time() - t0)
        return round(min(ts), 3)

    out = {}
    for n in names:
        tu = min3(n, UNIFORM)
        tk = min3(n, SKEWED)
        out[n] = {
            "uniform": tu,
            "skewed": tk,
            "skew_penalty": round(tk / tu, 2),
        }
        print(
            f"{n:34s} uniform={tu:7.2f}  skewed={tk:7.2f}"
            f"  x{tk / tu:5.2f}",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
