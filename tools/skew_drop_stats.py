"""Posting-list cap drop stats under the decade-scale shingle flood
(r9 verdict #3 companion to the sf10_skew A/B): run the two LSH
candidate paths on sf10 and sf10_skew with a ``pyspark.sql.Observation``
attached to the bucket cap (max_bucket=10_000) and record how many
(band, bucket) posting lists were dropped and the largest bucket seen —
the quantity the "caps bound the hot buckets" claim rests on.

    python tools/skew_drop_stats.py          # prints one JSON line
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation  # noqa: E402

from amazon_lookout_for_equipment_python_sdk_spark.operators import dedup as dd  # noqa: E402
from amazon_lookout_for_equipment_python_sdk_spark.plans.registry import load  # noqa: E402
from amazon_lookout_for_equipment_python_sdk_spark.session import get_spark  # noqa: E402

LOCAL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata"
)


def main() -> None:
    spark = get_spark("skew_drop_stats")
    out = {}
    for fixture in ("sf10", "sf10_skew"):
        docs = load(spark, os.path.join(LOCAL, fixture), "documents")
        for name, run in (
            (
                "ngram_jaccard_lsh",
                lambda d, obs: dd.ngram_jaccard_lsh(
                    d, shingle_n=3, threshold=0.5, cap_observation=obs
                ),
            ),
            (
                "minhash_lsh_candidates",
                lambda d, obs: dd.minhash_candidate_pairs(
                    d, num_perm=8, bands=2, shingle_n=3,
                    max_bucket=10_000, cap_observation=obs,
                ),
            ),
        ):
            obs = Observation()
            n_pairs = run(docs, obs).count()
            got = obs.get
            out[f"{name}@{fixture}"] = {
                "pairs": n_pairs,
                "dropped_buckets": int(got.get("dropped_buckets") or 0),
                "max_bucket_seen": int(got.get("max_bucket_seen") or 0),
            }
            print(f"{name}@{fixture}: {out[f'{name}@{fixture}']}",
                  file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
