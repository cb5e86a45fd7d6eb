"""HNSW approximate-nearest-neighbor index (Malkov & Yashunin 2016),
deterministic variant.

Completes the engine's ANN family (hyperplane-LSH, IVF, PQ/IVF-PQ): the
graph index that dominates single-node serving benchmarks.  The honest
Spark split — the same split production HNSW systems use:

- **Build is single-node per shard.**  HNSW insertion is inherently
  sequential (each insert greedy-searches the graph so far), so the
  index builds driver-side over a collected serving corpus.  That bounds
  the corpus by index RAM — exactly the regime HNSW serves in practice
  (the 100 TB side of an HNSW deployment is the QUERY stream, not the
  corpus; for corpus-scale candidate generation use the LSH/IVF paths,
  or shard the corpus and build one graph per shard).
- **Search scales with Spark.**  The finished index broadcasts once and
  every executor answers queries row-local inside ``mapInPandas`` —
  query throughput scales linearly with executors, no shuffle.

Determinism (the repo contract): the classic level draw
``floor(-ln(U)·mL)`` is replaced by a hash-derived level — trailing
zero bits of the 48-bit md5 of the id give P(level >= l) = 2^-l, the
same geometric distribution, reproducible across runs and engines.
Neighbor selection is by (distance, id) so ties break identically.
"""

from __future__ import annotations

import hashlib
import heapq
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hash_level(vid, max_level: int = 8) -> int:
    h = int(hashlib.md5(str(vid).encode()).hexdigest()[:12], 16)
    lvl = 0
    while lvl < max_level and (h >> lvl) & 1 == 0:
        lvl += 1
    return lvl


class HnswIndex:
    """In-memory deterministic HNSW over unit-normalized vectors
    (cosine == negative inner-product distance)."""

    def __init__(self, M: int = 12, ef_construction: int = 128):
        self.M = M
        self.ef_construction = ef_construction
        self.ids: list = []
        #: list of unit vectors (ndarray rows) — a list, not a growing
        #: matrix: per-insert np.vstack would make the build O(n^2) in
        #: memory traffic
        self.vecs: list = []
        self.levels: list[int] = []
        #: adjacency per level: list[dict[node -> list[node]]]
        self.graph: list[dict[int, list[int]]] = []
        self.entry: int | None = None

    # -- distances (negative cosine on normalized vectors) ------------------
    def _dist(self, q: "np.ndarray", i: int) -> float:
        return float(-np.dot(q, self.vecs[i]))

    def _search_layer(self, q, entry, ef, level):
        """Beam search in one layer; returns [(dist, node)] sorted."""
        visited = {entry}
        d0 = self._dist(q, entry)
        cand = [(d0, entry)]  # min-heap
        best = [(-d0, entry)]  # max-heap of current ef best
        adj = self.graph[level]
        while cand:
            d, c = heapq.heappop(cand)
            if d > -best[0][0]:
                break
            for nb in adj.get(c, ()):
                if nb in visited:
                    continue
                visited.add(nb)
                dn = self._dist(q, nb)
                if len(best) < ef or dn < -best[0][0]:
                    heapq.heappush(cand, (dn, nb))
                    heapq.heappush(best, (-dn, nb))
                    if len(best) > ef:
                        heapq.heappop(best)
        return sorted((-nd, n) for nd, n in best)

    def _select(self, cands):
        """Trim to M by (distance, id) — deterministic tie-break."""
        return [
            n
            for _, n in sorted(
                cands, key=lambda t: (t[0], self.ids[t[1]])
            )[: self.M]
        ]

    def add(self, vid, vec: "np.ndarray") -> None:
        idx = len(self.ids)
        self.ids.append(vid)
        v = vec / max(float(np.linalg.norm(vec)), 1e-30)
        self.vecs.append(v)
        lvl = _hash_level(vid)
        self.levels.append(lvl)
        while len(self.graph) <= lvl:
            self.graph.append({})
        if self.entry is None:
            self.entry = idx
            for l_ in range(lvl + 1):
                self.graph[l_][idx] = []
            return
        # descend from the top to lvl+1 greedily
        cur = self.entry
        for l_ in range(len(self.graph) - 1, lvl, -1):
            if cur not in self.graph[l_]:
                continue
            cur = self._search_layer(v, cur, 1, l_)[0][1]
        # insert with beam search on each level <= lvl
        for l_ in range(min(lvl, len(self.graph) - 1), -1, -1):
            if cur not in self.graph[l_]:
                self.graph[l_][idx] = []
                continue
            found = self._search_layer(v, cur, self.ef_construction, l_)
            nbrs = self._select(found)
            self.graph[l_][idx] = list(nbrs)
            for nb in nbrs:
                lst = self.graph[l_].setdefault(nb, [])
                lst.append(idx)
                if len(lst) > self.M:
                    cands = [
                        (float(-np.dot(self.vecs[nb], self.vecs[x])), x)
                        for x in lst
                    ]
                    self.graph[l_][nb] = self._select(cands)
            cur = found[0][1]
        if self.levels[idx] > self.levels[self.entry]:
            self.entry = idx

    def search(self, q: "np.ndarray", k: int, ef: int = 64):
        """Top-k (id, cosine) for a query vector."""
        if self.entry is None:
            return []
        qn = q / max(float(np.linalg.norm(q)), 1e-30)
        cur = self.entry
        for l_ in range(len(self.graph) - 1, 0, -1):
            if cur not in self.graph[l_]:
                continue
            cur = self._search_layer(qn, cur, 1, l_)[0][1]
        found = self._search_layer(qn, cur, max(ef, k), 0)
        out = [(self.ids[n], -d) for d, n in found[:k]]
        return out


#: hnsw_build refuses corpora beyond this row count — the declared
#: index-RAM serving regime.  An unguarded 100x-scale misuse would fail
#: late with a driver OOM; the guard fails fast with the alternative.
HNSW_BUILD_MAX_ROWS = 2_000_000


def hnsw_build(
    vectors: DataFrame,
    M: int = 12,
    ef_construction: int = 128,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = HNSW_BUILD_MAX_ROWS,
) -> HnswIndex:
    """Collect the serving corpus and build the graph driver-side in
    deterministic id order (see module doc for why build is single-node
    and what bounds corpus size).

    The count-guard (cheap metadata/agg job before any collect) enforces
    the regime: above ``max_rows`` the build raises instead of OOMing
    the driver mid-collect.  For corpora past the bound, shard by a key
    (one HnswIndex per shard via applyInPandas, fan out queries to all
    shards, take the global top-k) or switch to the IVF/PQ operators
    (operators/similarity.py), which serve from executors."""
    n = vectors.count()
    if n > max_rows:
        raise ValueError(
            f"hnsw_build collects every vector to the driver: corpus has "
            f"{n} rows > max_rows={max_rows}.  Use hnsw_topk_sharded "
            f"(one executor-side index per hash shard + query fan-out) "
            f"or the IVF/PQ ANN operators for executor-side serving."
        )
    rows = (
        vectors.select(id_col, vec_col).orderBy(id_col).collect()
    )
    idx = HnswIndex(M=M, ef_construction=ef_construction)
    for r in rows:
        idx.add(r[id_col], np.asarray(r[vec_col], dtype=np.float64))
    return idx


def hnsw_topk(
    queries: DataFrame,
    index: HnswIndex,
    k: int = 10,
    ef: int = 64,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed search: the index broadcasts once; each executor
    answers its queries row-local (mapInPandas) — zero shuffle, linear
    scale-out in query volume."""
    spark = queries.sparkSession
    bidx = spark.sparkContext.broadcast(index)
    id_type = queries.schema[query_id_col].dataType
    vid_type = T.LongType() if index.ids and isinstance(
        index.ids[0], int
    ) else T.StringType()
    schema = T.StructType(
        [
            T.StructField(query_id_col, id_type),
            T.StructField("vec_id", vid_type),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ix = bidx.value
        for pdf in batches:
            qids, vids, sims = [], [], []
            for qid, vec in zip(pdf[query_id_col], pdf[vec_col]):
                for vid, cos in ix.search(
                    np.asarray(vec, dtype=np.float64), k, ef
                ):
                    qids.append(qid)
                    vids.append(vid)
                    sims.append(cos)
            yield pd.DataFrame(
                {query_id_col: qids, "vec_id": vids, "cos": sims}
            )

    return queries.select(query_id_col, vec_col).mapInPandas(
        run, schema=schema
    )


def hnsw_topk_sharded(
    vectors: DataFrame,
    queries: DataFrame,
    n_shards: int = 8,
    k: int = 10,
    M: int = 12,
    ef_construction: int = 128,
    ef: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Corpus-scale HNSW — the sharded regime :func:`hnsw_build`'s guard
    points at: the corpus hash-shards deterministically
    (``pmod(xxhash64(id), n_shards)``), ONE graph builds per shard
    INSIDE ``applyInPandas`` (sequential within a shard — HNSW's
    inherent build constraint — but shards build in parallel on
    executors, and no vector ever reaches the driver), every query
    searches every shard, and a per-query window merges the per-shard
    top-k into the global top-k.

    The query batch broadcasts into the shard tasks (the bounded
    query-batch serving regime, like the IVF probe sets); corpus scale
    is bounded only by per-shard index RAM — raise ``n_shards`` to
    shrink shards.  Merged results can only IMPROVE on a single index
    searched with the same ``ef`` (each shard's graph is smaller, so
    per-shard recall at fixed ef is higher); the recall floor is
    pytest-pinned against brute force."""
    spark = vectors.sparkSession
    qrows = queries.select(query_id_col, vec_col).collect()
    qb = spark.sparkContext.broadcast(
        [(r[query_id_col], np.asarray(r[vec_col], np.float64)) for r in qrows]
    )
    id_type = vectors.schema[id_col].dataType
    qid_type = queries.schema[query_id_col].dataType
    schema = T.StructType(
        [
            T.StructField(query_id_col, qid_type),
            T.StructField("vec_id", id_type),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def per_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        idx = HnswIndex(M=M, ef_construction=ef_construction)
        order = pdf.sort_values(id_col)
        for vid, vec in zip(order[id_col], order[vec_col]):
            idx.add(vid, np.asarray(vec, dtype=np.float64))
        qids, vids, sims = [], [], []
        for qid, qv in qb.value:
            for vid, cos in idx.search(qv, k, ef):
                qids.append(qid)
                vids.append(vid)
                sims.append(cos)
        return pd.DataFrame({query_id_col: qids, "vec_id": vids, "cos": sims})

    sharded = vectors.select(
        id_col,
        vec_col,
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).alias("_shard"),
    )
    local = sharded.groupBy("_shard").applyInPandas(
        lambda pdf: per_shard(pdf), schema=schema
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), "vec_id")
    return (
        local.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
