"""Runnable tour of the LLM-data-pipeline layer on the bundled testdata.

    python docs/examples/llm_pipeline_demo.py [sf_dir]

Walks the corpus path a training-data job takes: quality gate ->
near-dup removal -> DSIR target-domain selection -> deterministic split
-> sequence packing -> assembled examples, then the embedding side:
SemDeDup semantic pruning and ANN serving (exact cosine baseline vs
hyperplane-LSH vs IVF vs PQ/IVF-PQ on the same probes).
Every step is a lazy DataFrame — nothing materializes until the final
counts — so the same composition runs unchanged on a cluster."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.session import get_spark
from amazon_lookout_for_equipment_python_sdk_spark.operators import (
    corpus as cp,
    dedup as dd,
    dsir,
    similarity as sim,
    text as tx,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("llm-pipeline-demo", cpus=4)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1. corpus prep, one lazy plan end to end
    clean = tx.quality_filter(docs, min_tokens=20, max_stopword_ratio=0.4)
    keep = dd.dedup_near(clean.select("doc_id", "text", "source"))
    # r6: keep the raw-pool docs most shaped like the src0 target domain
    target = keep.filter(F.col("source") == "src0")
    pool = keep.filter(F.col("source") != "src0")
    lr = dsir.dsir_logratio(
        dsir.hashed_bucket_totals(pool), dsir.hashed_bucket_totals(target)
    )
    scores = dsir.dsir_scores(dsir.hashed_ngram_counts(pool), lr)
    selected = keep.join(
        scores.orderBy(F.desc("logw")).limit(200).select("doc_id"),
        "doc_id",
        "left_semi",
    ).unionByName(target)
    train = cp.hash_split(selected, "text").filter(F.col("split") == "train")
    packed = cp.assemble_packs(train, budget_tokens=512)
    print("packs:", packed.count(), "| sample:")
    packed.orderBy("source", "pack_id").show(3, truncate=60)

    # 2. r6 SemDeDup: semantic near-dup pruning before indexing
    import numpy as np

    seeds = sorted(
        emb.filter(F.col("vec_id") < 16).select("vec_id", "embedding").collect(),
        key=lambda r: r["vec_id"],
    )
    cents = np.stack([np.asarray(r["embedding"], float) for r in seeds])
    sd = sim.semantic_dedup(emb, cents, threshold=0.45)
    print("semantic dedup: dropped", sd.filter("dropped").count(), "of", sd.count())

    # 3. ANN serving: same probes through four search strategies
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sim.cosine_topk(emb, probes, k=5)
    lsh = sim.lsh_cosine_topk(emb, probes, k=5)
    centroids = sim.pq_codebooks_from_seeds(emb, m=1, n_codes=16)[0]
    assigned = sim.ivf_assign_cells(emb, centroids)
    ivf = sim.ivf_cosine_topk(emb, probes, centroids, assigned, k=5)
    cb = sim.pq_codebooks_from_seeds(emb)
    pq = sim.pq_adc_topk(emb, probes, cb, k=5)
    for name, df, score in [
        ("exact", exact, "cos"),
        ("lsh", lsh, "cos"),
        ("ivf", ivf, "cos"),
        ("pq", pq, "pq_score"),
    ]:
        top = {
            r["query_id"]: r["vec_id"]
            for r in df.groupBy("query_id")
            .agg(F.max_by("vec_id", F.col(score)).alias("vec_id"))
            .collect()
        }
        print(f"{name:>6}: top-1 per probe = {top}")


if __name__ == "__main__":
    main()
