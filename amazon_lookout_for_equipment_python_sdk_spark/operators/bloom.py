"""Bloom-filter join pruning — pure-DataFrame, zero UDFs.

Spark's own ``bloom_filter_agg`` / ``might_contain`` expressions exist only
as internal (non-registered) functions used by the runtime row-level
filter rule, so this module builds the same structure out of public
DataFrame primitives:

- **build**: each build-side key hashes to ``num_hashes`` bit positions
  (``xxhash64(key, seed)`` per seed, ``pmod`` into ``num_bits``); positions
  fold into 64-bit words with a partial-aggregating ``bit_or`` — the
  shuffle after map-side combine is at most ``num_bits/64`` rows per
  partition regardless of build cardinality.
- **probe**: the finished bitmap is ONE row carrying an
  ``array<long>`` of ``num_bits/64`` words (1 MiB of bits = 16 Ki longs =
  128 KiB serialized), broadcast to the probe side; the membership test is
  a whole-stage-codegen bit test per hash — no shuffle of the probe table
  and no Python.

At 100 TB the point of the exercise is ``bloom_semi_join``: the probe
(fact) side is filtered BEFORE its shuffle for the exact semi-join, so the
shuffle carries only rows that pass the bloom (true matches + the false-
positive ~0.1%-ish tail), not the whole fact table.  The final semi-join
removes false positives, so results are exactly equal to a plain semi-join
— which is what the DuckDB oracle checks.

Reference parity: the reference SDK validates signal membership driver-side
(plot.py:136-143 builds a python set); this is the cluster-scale version of
the same membership check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bit_positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The ``num_hashes`` bloom bit positions of a key: seeded xxhash64
    folded into [0, num_bits).  Seeding via an extra hashed literal column
    keeps every hash inside codegen (xxhash64 has no seed parameter in the
    public DataFrame API)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(j)), F.lit(num_bits)).cast("long")
        for j in range(num_hashes)
    ]


def _shl1(pos: Column) -> Column:
    """``1L << (pos % 64)`` with a COLUMN shift amount (the PySpark
    ``shiftleft`` wrapper only takes an int literal)."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
    )


def bloom_bitmap(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """ONE-row DataFrame ``(bf: array<long>)`` — the bloom bitmap of
    ``keys[key_col]`` as ``num_bits/64`` little-endian 64-bit words.

    Two hash-aggregate stages, both map-side combinable: positions →
    ``bit_or`` per word (≤ num_bits/64 groups), then words → one dense
    zero-filled array (missing words coalesce to 0).
    """
    if num_bits % 64:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    n_words = num_bits // 64
    pos = keys.select(
        F.explode(
            F.array(*_bit_positions(F.col(key_col), num_bits, num_hashes))
        ).alias("_pos")
    )
    # union an explicit zero row per word so the final collect is DENSE:
    # sorting (word, bits) structs then projecting bits gives the array
    # directly.  (The tempting map_from_entries + element_at-per-index
    # fill is O(words^2) — Spark maps scan linearly per lookup.)
    zeros = keys.sparkSession.range(n_words).select(
        F.col("id").alias("_w"), F.lit(0).cast("long").alias("_m")
    )
    words = (
        pos.select(
            F.shiftright("_pos", 6).alias("_w"),
            _shl1(F.col("_pos")).alias("_m"),
        )
        .unionByName(zeros)
        .groupBy("_w")
        .agg(F.bit_or("_m").alias("_bits"))
    )
    return words.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_w", "_bits"))),
            lambda e: e["_bits"],
        ).alias("bf")
    )


def bloom_might_contain(
    bf: Column, key: Column, num_bits: int, num_hashes: int
) -> Column:
    """Membership bit test against an ``array<long>`` bitmap column: true
    iff every seeded hash position's bit is set.  Pure codegen — AND of
    ``num_hashes`` shift/mask tests."""
    pred = F.lit(True)
    for p in _bit_positions(key, num_bits, num_hashes):
        word = F.element_at(bf, F.shiftright(p, 6).cast("int") + 1)
        pred = pred & (word.bitwiseAND(_shl1(p)) != 0)
    return pred


def bloom_prune(
    df: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Filter ``df`` to rows whose key *might* be in the bloom ``bitmap``
    (one-row DataFrame from :func:`bloom_bitmap`, broadcast).  Keeps all
    true members; passes false positives at the bitmap's FP rate."""
    return (
        df.crossJoin(F.broadcast(bitmap))
        .filter(
            bloom_might_contain(F.col("bf"), F.col(key_col), num_bits, num_hashes)
        )
        .drop("bf")
    )


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """``big ⋉ small`` with a bloom pre-prune of the big side.

    Exactly equivalent to ``big.join(small, key, "left_semi")`` — the
    bloom only removes definite non-members before the semi-join shuffle,
    and the semi-join removes the bloom's false positives.  The win at
    scale: the fact-side shuffle carries ~|matches| rows instead of |big|.
    """
    bm = bloom_bitmap(small.select(small_key), small_key, num_bits, num_hashes)
    pruned = bloom_prune(big, big_key, bm, num_bits, num_hashes)
    return pruned.join(
        small.select(F.col(small_key).alias(big_key)).distinct(), big_key, "left_semi"
    )
