"""Similarity search over embedding columns (LLM-pipeline ANN layer).

Baseline: brute-force cosine top-k — exact, verified against a DuckDB
oracle.  Scale path: hyperplane-LSH bucketing (deterministic md5-derived
hyperplanes) that restricts the candidate set to colliding buckets — the
standard ANN trade-off (recall measured in tests against brute force).

Numeric portability: embeddings are float32 at rest; all arithmetic casts
to double FIRST (float32->double is exact), then the dot product is a
sequential left fold (``F.aggregate``) — bit-identical to DuckDB's
``list_dot_product(CAST AS DOUBLE[]))`` (verified).

Scale design: brute force is a broadcast nested-loop of Q queries x N rows
— linear in N, perfect for "a handful of probes against 100 TB"; for
query-set joins the LSH variant turns it into an equi-join on bucket.  No
Python UDFs anywhere — higher-order functions stay in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic, codegen'd)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force cosine top-k per query (exact baseline).

    ``queries``: (query_id, embedding).  Returns (query_id, vec_id, cos)
    with deterministic ranking: order by cos desc, then vec_id.  Queries
    are broadcast; the big side streams — one scan, no shuffle of vectors.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(vec_col).alias("_qvec")
        )
    )
    scored = vectors.crossJoin(q).filter(
        F.col(query_id_col) != F.col(id_col)
    ).select(
        query_id_col,
        id_col,
        cosine(F.col("_qvec"), F.col(vec_col)).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), id_col)
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )


def hyperplane_bucket(
    vec: Column, num_planes: int = 8, dim: int = 64
) -> Column:
    """Deterministic LSH bucket: sign pattern of dot(vec, H_p) packed into a
    long, where hyperplane H_p[d] = conv(md5('p|d')[:12], 16, 10)/2^47 - 1
    (pseudo-uniform in [-1, 1), reproducible everywhere — no RNG state).
    """
    v = _as_double(vec)
    bits = []
    for p in range(num_planes):
        # plane component expression for index d: derived from md5(p|d)
        plane = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d, p=p: F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.lit(str(p)), d.cast("string"))), 1, 12
                ),
                16,
                10,
            ).cast("long")
            / F.lit(float(2**47))
            - F.lit(1.0),
        )
        proj = F.aggregate(
            F.zip_with(v, plane, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def lsh_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN top-k: candidates = vectors in the query's hyperplane bucket,
    then exact cosine rank within candidates.  Trades recall for a bucket
    equi-join; recall vs brute force is asserted in tests."""
    vb = vectors.withColumn("_bkt", hyperplane_bucket(F.col(vec_col), num_planes, dim))
    qb = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("_qvec"),
        ).withColumn("_bkt", hyperplane_bucket(F.col("_qvec"), num_planes, dim))
    )
    scored = vb.join(qb, "_bkt").filter(F.col(query_id_col) != F.col(id_col)).select(
        query_id_col,
        id_col,
        cosine(F.col("_qvec"), F.col(vec_col)).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), id_col)
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )
