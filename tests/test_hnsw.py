"""Deterministic HNSW ANN (operators/hnsw.py)."""

from __future__ import annotations

import numpy as np
import pytest

from amazon_lookout_for_equipment_python_sdk_spark.operators import hnsw as hn


def _corpus(n=300, dim=16, seed=5):
    rng = np.random.RandomState(seed)
    centers = rng.normal(0, 1, (6, dim))
    vecs = []
    for i in range(n):
        vecs.append(centers[i % 6] + rng.normal(0, 0.08, dim))
    return np.array(vecs)


def test_hnsw_recall_vs_bruteforce(spark):
    dim = 16
    vecs = _corpus()
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    index = hn.hnsw_build(corpus)

    rng = np.random.RandomState(9)
    queries = [(1000 + i, vecs[i * 7] + rng.normal(0, 0.05, dim)) for i in range(20)]
    qdf = spark.createDataFrame(
        [(q, [float(x) for x in v]) for q, v in queries],
        "query_id long, embedding array<double>",
    )
    got = hn.hnsw_topk(qdf, index, k=5, ef=64).collect()
    pairs = {(r["query_id"], r["vec_id"]) for r in got}
    # brute-force cosine truth
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    truth = set()
    for q, v in queries:
        vq = v / np.linalg.norm(v)
        top = np.argsort(-(norm @ vq))[:5]
        truth |= {(q, int(t)) for t in top}
    recall = len(pairs & truth) / len(truth)
    assert recall >= 0.95, recall
    # scores are real cosines
    by_pair = {(r["query_id"], r["vec_id"]): r["cos"] for r in got}
    for (q, v), cos in list(by_pair.items())[:10]:
        vq = queries[q - 1000][1]
        want = float(
            (vecs[v] / np.linalg.norm(vecs[v]))
            @ (vq / np.linalg.norm(vq))
        )
        assert cos == pytest.approx(want, abs=1e-9)


def test_hnsw_build_is_deterministic(spark):
    vecs = _corpus(n=100)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = hn.hnsw_build(corpus, M=6, ef_construction=32)
    b = hn.hnsw_build(corpus, M=6, ef_construction=32)
    assert a.levels == b.levels and a.entry == b.entry
    assert a.graph == b.graph  # identical adjacency, run to run


def test_hnsw_hash_levels_geometric():
    # P(level >= l) = 2^-l over many ids
    levels = [hn._hash_level(i) for i in range(20_000)]
    frac1 = sum(1 for l_ in levels if l_ >= 1) / len(levels)
    frac2 = sum(1 for l_ in levels if l_ >= 2) / len(levels)
    assert abs(frac1 - 0.5) < 0.02 and abs(frac2 - 0.25) < 0.02


def test_hnsw_search_plan_is_shuffle_free(spark):
    vecs = _corpus(n=50)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    index = hn.hnsw_build(corpus)
    qdf = spark.createDataFrame(rows[:3], "query_id long, embedding array<double>")
    plan = (
        hn.hnsw_topk(qdf, index, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_hnsw_build_guards_oversized_corpus(spark):
    """The single-node build regime must fail fast (count guard, before
    any collect) on a corpus past max_rows, naming the alternatives."""
    import pytest

    from amazon_lookout_for_equipment_python_sdk_spark.operators.hnsw import (
        hnsw_build,
    )

    big = spark.range(1_000).selectExpr(
        "id AS vec_id", "array(CAST(id AS DOUBLE)) AS embedding"
    )
    with pytest.raises(ValueError, match="max_rows"):
        hnsw_build(big, max_rows=999)
    # at the bound it builds fine
    idx = hnsw_build(big.limit(5), max_rows=5)
    assert len(idx.ids) == 5


def test_hnsw_sharded_recall_and_no_driver_collect_of_corpus(spark):
    """Sharded regime: per-shard executor-side builds + query fan-out +
    global merge must reach the same recall floor as the single index —
    and must work on a corpus LARGER than hnsw_build's guard, proving it
    is the guard's real alternative."""
    dim = 16
    vecs = _corpus(n=400)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    rng = np.random.RandomState(9)
    queries = [(1000 + i, vecs[i * 7] + rng.normal(0, 0.05, dim)) for i in range(15)]
    qdf = spark.createDataFrame(
        [(q, [float(x) for x in v]) for q, v in queries],
        "query_id long, embedding array<double>",
    )
    # the guard would refuse this corpus at max_rows=300...
    with pytest.raises(ValueError, match="max_rows"):
        hn.hnsw_build(corpus, max_rows=300)
    # ...but the sharded path serves it
    got = hn.hnsw_topk_sharded(corpus, qdf, n_shards=4, k=5, ef=64)
    rows_out = got.collect()
    pairs = {(r["query_id"], r["vec_id"]) for r in rows_out}
    assert all(
        len([1 for p in pairs if p[0] == q]) == 5 for q, _ in queries
    )
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    truth = set()
    for q, v in queries:
        vq = v / np.linalg.norm(v)
        for t in np.argsort(-(norm @ vq))[:5]:
            truth.add((q, int(t)))
    recall = len(pairs & truth) / len(truth)
    assert recall >= 0.95, recall
