"""Bloom-filter join pruning (operators/bloom.py): no-false-negative
property, exact semi-join equivalence, bitmap shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.operators.bloom import (
    bloom_bitmap,
    bloom_prune,
    bloom_semi_join,
)


def test_bitmap_shape_and_density(spark):
    keys = spark.range(1000).select(F.col("id").alias("k"))
    row = bloom_bitmap(keys, "k", num_bits=1 << 14, num_hashes=4).first()
    assert len(row.bf) == (1 << 14) // 64
    set_bits = sum(bin(w & (2**64 - 1)).count("1") for w in row.bf)
    # 4000 insertions into 16384 bits: some collisions, never more bits
    # than insertions, and at least half that many distinct positions
    assert 2000 <= set_bits <= 4000


def test_prune_has_no_false_negatives(spark):
    build = spark.range(0, 500, 7).select(F.col("id").alias("k"))
    probe = spark.range(2000).select(F.col("id").alias("k"))
    bm = bloom_bitmap(build, "k", num_bits=1 << 14, num_hashes=4)
    passed = {
        r.k for r in bloom_prune(probe, "k", bm, 1 << 14, 4).collect()
    }
    members = set(range(0, 500, 7))
    assert members <= passed  # every true member survives the prune
    # and the prune actually prunes (FP rate far below pass-everything)
    assert len(passed) < 2000 * 0.5


def test_bloom_semi_join_equals_plain_semi_join(spark):
    big = spark.range(5000).select(
        (F.col("id") % 700).alias("fk"), F.col("id").alias("payload")
    )
    small = spark.range(0, 700, 13).select(F.col("id").alias("pk"))
    got = {
        (r.fk, r.payload)
        for r in bloom_semi_join(
            big, small, "fk", "pk", num_bits=1 << 12, num_hashes=3
        ).collect()
    }
    want = {
        (r.fk, r.payload)
        for r in big.join(
            small.select(F.col("pk").alias("fk")), "fk", "left_semi"
        ).collect()
    }
    assert got == want


def test_empty_build_side_prunes_everything(spark):
    build = spark.range(0).select(F.col("id").alias("k"))
    probe = spark.range(100).select(F.col("id").alias("k"))
    bm = bloom_bitmap(build, "k", num_bits=1 << 10, num_hashes=3)
    assert bloom_prune(probe, "k", bm, 1 << 10, 3).count() == 0
