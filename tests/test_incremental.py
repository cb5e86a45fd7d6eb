"""Incremental dedup (operators/incremental.py): batch-vs-index flags
agree with what full-corpus dedup would say about the cross pairs, and
the index cycle (build -> probe -> append) closes."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.operators.dedup import (
    ngram_jaccard_lsh,
)
from amazon_lookout_for_equipment_python_sdk_spark.operators.incremental import (
    dedup_index_frames,
    incremental_dedup,
)

BASE = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "spark executes distributed dataframe plans with catalyst and tungsten"),
    (3, "minhash signatures band into buckets for locality sensitive hashing"),
]
NEW = [
    # exact dup of base doc 1
    (10, "the quick brown fox jumps over the lazy dog near the river bank"),
    # near dup of base doc 2 (one word changed)
    (11, "spark executes distributed dataframe plans with catalyst and arrow"),
    # fresh
    (12, "completely unrelated content about cooking pasta with fresh basil"),
    # near dup of ANOTHER new doc only -> must NOT flag (index knows base only)
    (13, "completely unrelated content about cooking pasta with dried basil"),
]


def _frames(spark):
    base = spark.createDataFrame(BASE, "doc_id long, text string")
    new = spark.createDataFrame(NEW, "doc_id long, text string")
    return base, new


def test_incremental_flags_match_full_dedup(spark):
    base, new = _frames(spark)
    exact, bands_tbl, hashes = dedup_index_frames(base)
    out = incremental_dedup(new, exact, bands_tbl, hashes, threshold=0.5)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[10].is_exact_dup and rows[10].near_dup_of is None
    assert not rows[11].is_exact_dup and rows[11].near_dup_of == 2
    assert not rows[12].is_exact_dup and rows[12].near_dup_of is None
    # 13's only near-dup (12) is in the SAME batch, not the index
    assert not rows[13].is_exact_dup and rows[13].near_dup_of is None
    # cross-check: the full-corpus LSH path finds exactly the (base, new)
    # pairs the incremental probe flagged (plus intra-batch pairs it
    # deliberately leaves to the batch-level dedup)
    full = ngram_jaccard_lsh(base.unionByName(new)).collect()
    cross = {
        (min(r.a, r.b), max(r.a, r.b))
        for r in full
        if (r.a < 10) != (r.b < 10)
    }
    flagged = {
        (r.near_dup_of, r.doc_id)
        for r in rows.values()
        if r.near_dup_of is not None
    }
    assert flagged == {(2, 11)}
    assert flagged <= cross


def test_index_append_cycle(spark):
    """Index grows with the accepted batch; a re-probe of the same batch
    then flags everything as duplicate."""
    base, new = _frames(spark)
    exact, bands_tbl, hashes = dedup_index_frames(base)
    out = incremental_dedup(new, exact, bands_tbl, hashes)
    keep = out.filter(
        ~F.col("is_exact_dup") & F.col("near_dup_of").isNull()
    ).select("doc_id", "text")
    e2, b2, h2 = dedup_index_frames(keep)
    exact2 = exact.unionByName(e2).distinct()
    bands2 = bands_tbl.unionByName(b2)
    hashes2 = hashes.unionByName(h2)
    again = incremental_dedup(new, exact2, bands2, hashes2)
    rows = {r.doc_id: r for r in again.collect()}
    assert rows[12].is_exact_dup and rows[13].is_exact_dup  # now indexed
    assert rows[10].is_exact_dup
    assert rows[11].near_dup_of == 2
    # a FRESH near-variant of newly-indexed doc 12 flags against it now
    probe = spark.createDataFrame(
        [(14, "completely unrelated content about cooking pasta with fresh basil tonight")],
        "doc_id long, text string",
    )
    r14 = incremental_dedup(probe, exact2, bands2, hashes2).first()
    assert not r14.is_exact_dup and r14.near_dup_of == 12
