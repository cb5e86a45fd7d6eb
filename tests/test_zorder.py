"""Z-order clustering (operators/zorder.py): Morton key correctness and
the actual data-skipping payoff (file min/max overlap factor)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.operators.zorder import (
    interleave_bits,
    zorder_key,
    zorder_write,
)


def test_interleave_bits_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5)], "a long, b long"
    )
    out = df.select(
        "a", "b", interleave_bits([F.col("a"), F.col("b")], bits=4).alias("z")
    )
    got = {(r.a, r.b): r.z for r in out.collect()}
    # bit i of a -> position 2i; bit i of b -> position 2i+1
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(1, 1)] == 3
    # a=3 (011), b=5 (101): z = interleave -> b2 a2 b1 a1 b0 a0 = 1 0 0 1 1 1
    assert got[(3, 5)] == 0b100111


def test_zorder_key_is_monotone_in_each_dim(spark):
    """Fixing one coordinate, the key grows with the other (locality)."""
    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    rows = zorder_key(df, ["x", "y"], bits=4).collect()
    by_xy = {(r.x, r.y): r.zkey for r in rows}
    for y in range(16):
        keys = [by_xy[(x, y)] for x in range(16)]
        assert keys == sorted(keys)
    for x in range(16):
        keys = [by_xy[(x, y)] for y in range(16)]
        assert keys == sorted(keys)


def test_zorder_write_skips_files_on_both_columns(spark, tmp_path):
    """The point of the layout: after clustering on (u, v), a point/range
    predicate on EITHER column overlaps only a minority of the files'
    [min, max] spans — the parquet scan prunes the rest from footer
    stats.  A plain insertion-order write has every file overlap."""
    import pyarrow.parquet as pq

    n = 20_000
    df = spark.range(n).select(
        (F.xxhash64("id") % 1000).alias("u"),
        (F.xxhash64("id", F.lit(1)) % 1000).alias("v"),
        F.col("id").alias("payload"),
    )
    path = str(tmp_path / "zorder")
    zorder_write(df, path, ["u", "v"], num_files=16)
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) >= 8  # range partitioner actually spread the data

    def overlap_fraction(col: str, point: int) -> float:
        hit = 0
        for f in files:
            md = pq.read_metadata(f)
            rg0 = md.row_group(0)
            idx = next(
                j
                for j in range(md.num_columns)
                if rg0.column(j).path_in_schema == col
            )
            stats = [
                md.row_group(i).column(idx).statistics
                for i in range(md.num_row_groups)
            ]
            lo = min(s.min for s in stats)
            hi = max(s.max for s in stats)
            if lo <= point <= hi:
                hit += 1
        return hit / len(files)

    # Both dimensions prune (a plain insertion-order write puts EVERY
    # file at overlap 1.0).  The exact fraction jitters with the range
    # partitioner's sample: Spark seeds RangePartitioner sampling with
    # the RDD id — a session-global counter — so in-suite runs see
    # different boundaries than isolated runs (observed 0.50 vs 0.5625
    # for "u" depending on how many tests ran before this one).  Pin
    # the contrast vs 1.0 with margin for that seed jitter, not a
    # boundary-exact fraction.
    assert overlap_fraction("u", 0) <= 0.7
    assert overlap_fraction("v", 0) <= 0.7
    # correctness: clustering is a permutation, nothing lost
    back = spark.read.parquet(path)
    assert back.count() == n
    assert back.agg(F.sum("payload")).first()[0] == n * (n - 1) // 2
