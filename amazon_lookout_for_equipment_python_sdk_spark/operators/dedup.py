"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

LLM-pipeline dedup layer (BASELINE.json north star).  Everything is
engine-portable deterministic hashing (md5-based — no Spark-specific
xxhash), so results verify against a DuckDB oracle bit-for-bit.

Scale design:
- Exact dedup: hash-groupBy on the fingerprint — one shuffle on a short
  key, map-side combinable.
- MinHash: explode (doc x shingle x perm) -> min per (doc, perm) is a hash
  agg; the LSH band join buckets signatures so candidate generation is an
  equi-join on (band, bucket) — the standard linear-scale near-dup path.
  Exact pairwise Jaccard runs ONLY on LSH candidates at scale (the
  all-pairs variant exists for oracle verification at small SF).
- SimHash: per-token hash -> per-bit +/-1 vote -> sign vector packed into a
  long; hamming-near pairs join on rotated bands of the packed value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import exploded_shingles, fingerprint


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup groups: one row per distinct text with the canonical
    (minimum) id and the duplicate count."""
    return (
        df.groupBy(fingerprint(F.col(text_col)).alias("fp"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_dups"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    num_perm: int = 8,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signature rows: (id, perm, minhash-hex).

    Permutation p's hash of shingle s is ``md5(p || '|' || s)``; the
    signature entry is the lexicographic minimum — deterministic and
    portable (hex strings order identically everywhere).
    """
    sh = exploded_shingles(df, shingle_n, text_col, id_col)
    perms = sh.select(
        id_col,
        "sh",
        F.explode(F.sequence(F.lit(0), F.lit(num_perm - 1))).alias("perm"),
    )
    return (
        perms.withColumn(
            "h", F.md5(F.concat_ws("|", F.col("perm").cast("string"), F.col("sh")))
        )
        .groupBy(id_col, "perm")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_perm: int = 8,
    bands: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH banding: concat each band's minhashes into a bucket key; docs
    sharing any (band, bucket) become a candidate pair (a < b).

    The join is equi on (band, bucket): linear in data size, skew-bounded
    because random hex buckets distribute uniformly.
    """
    rows_per_band = num_perm // bands
    banded = (
        signatures.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.concat_ws(":", F.col("perm").cast("string"), "minhash")))
            ).alias("bucket")
        )
    )
    a = banded.select(
        F.col(id_col).alias("a"), "band", "bucket"
    )
    b = banded.select(F.col(id_col).alias("b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    shingle_n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """n-gram Jaccard similarity pairs: |A ∩ B| / |A ∪ B| >= threshold.

    Without ``candidates`` this is the all-pairs-sharing-a-shingle join
    (inverted-index style — correct but quadratic in the worst case; for
    100 TB pass LSH candidates in).  Jaccard is exact integer arithmetic;
    the threshold compare happens on an integer cross-product
    (common * 1e6 >= thr * union) to stay bit-portable.
    """
    sh = exploded_shingles(df, shingle_n, text_col, id_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("a"), "sh")
    b = sh.select(F.col(id_col).alias("b"), "sh")
    common = (
        a.join(b, "sh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
    )
    if candidates is not None:
        common = common.join(candidates, ["a", "b"], "left_semi")
    sa = sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("nb"))
    thr_millionths = int(round(threshold * 1_000_000))
    out = (
        common.join(sa, "a")
        .join(sb, "b")
        .withColumn("n_union", F.col("na") + F.col("nb") - F.col("n_common"))
        .filter(
            F.col("n_common") * 1_000_000 >= F.lit(thr_millionths) * F.col("n_union")
        )
        .select(
            "a",
            "b",
            "n_common",
            "n_union",
            (F.col("n_common") / F.col("n_union").cast("double")).alias("jaccard"),
        )
    )
    return out


def simhash48(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """48-bit SimHash: per-token md5 -> 48-bit int; bit b of the signature
    is 1 iff sum over tokens of (+1 if bit set else -1) > 0.

    Portable construction: conv(first 12 hex chars, 16, 10) fits int64.
    Explodes (doc x token x bit) — heavy but linear; at scale the bit
    dimension (48) is a constant factor and everything map-side-combines.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).withColumn(
        "h", F.conv(F.substring(F.md5("tok"), 1, 12), 16, 10).cast("long")
    )
    bits = toks.select(
        id_col,
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(47))).alias("bit"),
    ).withColumn("vote", F.expr("(shiftright(h, bit) & 1) * 2 - 1"))
    votes = bits.groupBy(id_col, "bit").agg(F.sum("vote").alias("v"))
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )
