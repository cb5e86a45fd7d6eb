"""Z-order (Morton) multi-column clustering — the Delta/Iceberg
``OPTIMIZE ZORDER BY`` layout, from public DataFrame primitives.

Partition pruning (sources/sinks.write_partitioned) skips on ONE
low-cardinality column; Z-ordering makes min/max **file and row-group
statistics** selective on SEVERAL high-cardinality columns at once: each
column is quantized onto a 2^bits grid, the grid coordinates' bits are
interleaved into one Morton key, and the data is range-partitioned +
sorted by that key.  Nearby keys are nearby in every dimension, so each
output file covers a small hyper-rectangle and a predicate on ANY of the
z-columns overlaps only a few files — the scan skips the rest from
parquet footer stats without reading a row.

Everything is whole-stage-codegen arithmetic: quantization is one
broadcast join against a per-column min/max row (a single tiny agg), and
the bit interleave unrolls to shift/mask/or expressions.  The only
shuffle is the range partitioner that any clustered write needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default per-column resolution (16 bits -> 65536 grid cells/column)
DEFAULT_BITS = 16


def quantize_minmax(x: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map ``x`` linearly from [lo, hi] onto the integer grid
    [0, 2^bits): ``floor((x-lo)/(hi-lo) * (2^bits - 1))``.  Constant
    columns (hi == lo) collapse to cell 0.  IEEE-deterministic: one
    subtraction, one division, one multiply, one floor."""
    top = float((1 << bits) - 1)
    span = hi.cast("double") - lo.cast("double")
    q = F.floor(
        (x.cast("double") - lo.cast("double")) / span * F.lit(top)
    ).cast("long")
    return F.when(span == 0, F.lit(0).cast("long")).otherwise(
        F.least(F.greatest(q, F.lit(0).cast("long")), F.lit((1 << bits) - 1))
    )


def interleave_bits(qcols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton key of already-quantized coordinates: bit ``i`` of column
    ``c`` lands at position ``i * ncols + c``.  Unrolled shift/mask OR
    chain — pure codegen, no UDF.  ``ncols * bits`` must fit a long."""
    n = len(qcols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds a 63-bit key")
    z = F.lit(0).cast("long")
    for c, q in enumerate(qcols):
        for i in range(bits):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + c))
    return z


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS
) -> DataFrame:
    """Add a ``zkey`` column: the Morton key of ``cols`` quantized
    against their GLOBAL min/max (one tiny agg, broadcast — no second
    pass over the data per column)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    bounds = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(bounds))
    qs = [
        quantize_minmax(
            F.col(c), F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits
        )
        for c in cols
    ]
    out = out.withColumn("zkey", interleave_bits(qs, bits))
    return out.drop(*[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols])


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 32,
    bits: int = DEFAULT_BITS,
    mode: str = "overwrite",
) -> None:
    """Rewrite ``df`` as ``num_files`` parquet files clustered on the
    Morton key of ``cols`` (range-partition + in-file sort, key dropped
    before write).  After this, a filter on any of ``cols`` prunes most
    files/row-groups from their min/max footer stats alone —
    tests/test_zorder.py measures the file-overlap factor directly."""
    keyed = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(num_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode(mode)
        .parquet(path)
    )
