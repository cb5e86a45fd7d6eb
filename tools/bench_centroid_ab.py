"""A/B the lang_centroid_components input-partitioning variants
(VERDICT r16 item 4: 8-core beats 32-core at sf0.1 => the repartition
fans a ~780 KB scan out past the data).

Variants, alternated within one session (min-of-N each):
  a) current: load_par (repartition to defaultParallelism=32)
  b) plain load (scan partitioning as-is: 1 partition at sf0.1)
  c) size-derived: repartition to clamp(bytes/256KB, 1, cores)

Usage: python tools/bench_centroid_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.session import get_spark
from amazon_lookout_for_equipment_python_sdk_spark.plans.registry import (
    load,
    load_par,
    qfloor,
)
from amazon_lookout_for_equipment_python_sdk_spark.plans.llmops import (
    _CENT_SCALE,
)


def centroid(spark, sf_dir, emb):
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    ex = (
        emb.join(docs, emb["vec_id"] == docs["doc_id"])
        .select(
            "lang",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos", "x"
            ),
        )
        .withColumn(
            "xq",
            F.floor(F.col("x") * F.lit(_CENT_SCALE) + F.lit(0.5)).cast("long"),
        )
    )
    agg = ex.groupBy("lang", "pos").agg(
        F.count(F.lit(1)).alias("n_vecs"), F.sum("xq").alias("_s")
    )
    return agg.select(
        "lang",
        F.col("pos").cast("long").alias("pos"),
        "n_vecs",
        qfloor(
            F.col("_s").cast("double")
            / (F.col("n_vecs") * F.lit(_CENT_SCALE)),
            9,
        ).alias("centroid"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark("centroid_ab")
    cores = spark.sparkContext.defaultParallelism
    emb_bytes = os.path.getsize(os.path.join(sf_dir, "embeddings.parquet"))
    sized = max(1, min(cores, emb_bytes // (256 * 1024)))

    def emb_current():
        return load_par(spark, sf_dir, "embeddings")

    def emb_plain():
        return load(spark, sf_dir, "embeddings")

    def emb_sized():
        df = load(spark, sf_dir, "embeddings")
        if df.rdd.getNumPartitions() < sized:
            df = df.repartition(int(sized))
        return df

    variants = {
        "load_par_cores": emb_current,
        "plain_load": emb_plain,
        f"sized_{sized}": emb_sized,
    }
    for fn in variants.values():  # warmup
        centroid(spark, "/root/testdata/sf0.001", load(spark, "/root/testdata/sf0.001", "embeddings"))
        centroid(spark, sf_dir, fn()).write.format("noop").mode(
            "overwrite"
        ).save()
    runs = {k: [] for k in variants}
    for _ in range(reps):
        for k, fn in variants.items():  # alternate to spread weather evenly
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.2)
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            centroid(spark, sf_dir, fn()).write.format("noop").mode(
                "overwrite"
            ).save()
            runs[k].append(round(time.time() - t0, 3))
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "emb_bytes": emb_bytes,
                "mins": {k: min(v) for k, v in runs.items()},
                "runs": runs,
                "load_avg_end": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )


if __name__ == "__main__":
    main()
