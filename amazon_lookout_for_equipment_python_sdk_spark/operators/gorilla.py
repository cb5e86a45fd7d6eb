"""Gorilla time-series compression (Pelkonen et al., VLDB 2015) —
delta-of-delta timestamps + XOR-compressed float values, stdlib-only.

The storage codec for the reference's native domain (equipment sensor
series): regular-cadence streams compress to ~1-2 bits/point for
timestamps (dod = 0 almost always) and slowly-moving readings to a
fraction of their 64 bits (XOR against the previous value leaves a
short run of meaningful bits).  This is what makes keeping months of
raw 1 Hz sensor history cheap at 100 TB scale.

Engine shape: compression is PER-SERIES sequential (each point encodes
against its predecessor), so it runs inside ``applyInPandas`` — one
shuffle on the series key, every series compresses independently in
parallel, and the result is one (key, n_points, payload) row per series
(the natural archive-table layout).  Decompression is the mirror
``mapInPandas`` explode.

Bit layout (the paper's scheme, widened for 64-bit microsecond stamps):

- header: ``n`` (u32), ``t0`` (i64), ``v0`` (f64 bits).
- per subsequent point, timestamp delta-of-delta ``D``:
  ``0``             -> D == 0
  ``10``  + 7 bits  -> D in [-64, 63]
  ``110`` + 9 bits  -> D in [-256, 255]
  ``1110`` + 12 bits-> D in [-2048, 2047]
  ``1111`` + 64 bits-> raw
- per subsequent value, ``X = bits(v) XOR bits(prev)``:
  ``0``  -> X == 0
  ``10`` -> X fits the previous (leading, length) window; meaningful
            bits follow
  ``11`` -> 6-bit leading-zero count + 6-bit length (64 stored as 0),
            then the meaningful bits
"""

from __future__ import annotations

import struct


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bytes(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes(
                [(self.acc << (8 - self.nbits)) & 0xFF]
            )
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            byte = self.data[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


#: (payload bits, tag, tag bits); each class covers the natural two's
#: complement range [-2^(b-1), 2^(b-1)-1]
_DOD_RANGES = ((7, 0b10, 2), (9, 0b110, 3), (12, 0b1110, 4))


def gorilla_compress(timestamps: "list[int]", values: "list[float]") -> bytes:
    """(sorted int64 timestamps, float64 values) -> Gorilla block."""
    n = len(timestamps)
    if n != len(values):
        raise ValueError("timestamps and values must align")
    if n == 0:
        return struct.pack("<I", 0)
    head = struct.pack(
        "<Iq", n, int(timestamps[0])
    ) + struct.pack("<Q", struct.unpack("<Q", struct.pack("<d", float(values[0])))[0])
    w = _BitWriter()
    prev_t = int(timestamps[0])
    prev_delta = 0
    prev_bits = struct.unpack("<Q", struct.pack("<d", float(values[0])))[0]
    prev_lead, prev_len = -1, -1
    for i in range(1, n):
        t = int(timestamps[i])
        delta = t - prev_t
        dod = delta - prev_delta
        prev_t, prev_delta = t, delta
        if dod == 0:
            w.write(0, 1)
        else:
            for bits, tag, tagbits in _DOD_RANGES:
                if -(1 << (bits - 1)) <= dod <= (1 << (bits - 1)) - 1:
                    w.write(tag, tagbits)
                    w.write(dod, bits)
                    break
            else:
                w.write(0b1111, 4)
                w.write(dod, 64)
        vb = struct.unpack("<Q", struct.pack("<d", float(values[i])))[0]
        x = vb ^ prev_bits
        prev_bits = vb
        if x == 0:
            w.write(0, 1)
            continue
        lead = 64 - x.bit_length()
        trail = (x & -x).bit_length() - 1
        length = 64 - lead - trail
        if (
            prev_lead >= 0
            and lead >= prev_lead
            and trail >= 64 - prev_lead - prev_len
        ):
            w.write(0b10, 2)
            shift = 64 - prev_lead - prev_len
            w.write(x >> shift, prev_len)
        else:
            w.write(0b11, 2)
            w.write(lead, 6)
            w.write(length & 0x3F, 6)  # 64 stored as 0
            w.write(x >> trail, length)
            prev_lead, prev_len = lead, length
    return head + w.bytes()


def gorilla_decompress(payload: bytes) -> tuple["list[int]", "list[float]"]:
    """Gorilla block -> (timestamps, values), bit-exact round trip."""
    (n,) = struct.unpack_from("<I", payload, 0)
    if n == 0:
        return [], []
    (t0,) = struct.unpack_from("<q", payload, 4)
    (v0_bits,) = struct.unpack_from("<Q", payload, 12)
    ts = [t0]
    vals = [struct.unpack("<d", struct.pack("<Q", v0_bits))[0]]
    r = _BitReader(payload[20:])
    prev_delta = 0
    prev_bits = v0_bits
    prev_lead, prev_len = -1, -1
    for _ in range(n - 1):
        if r.read(1) == 0:
            dod = 0
        else:
            for bits, _tag, _tagbits in _DOD_RANGES:
                if r.read(1) == 0:
                    raw = r.read(bits)
                    dod = raw - (1 << bits) if raw >= (1 << (bits - 1)) else raw
                    break
            else:
                raw = r.read(64)
                dod = raw - (1 << 64) if raw >= (1 << 63) else raw
        prev_delta += dod
        ts.append(ts[-1] + prev_delta)
        c = r.read(1)
        if c == 0:
            vals.append(vals[-1])
            continue
        if r.read(1) == 0:  # '10': reuse window
            shift = 64 - prev_lead - prev_len
            x = r.read(prev_len) << shift
        else:  # '11': new window
            prev_lead = r.read(6)
            prev_len = r.read(6) or 64
            x = r.read(prev_len) << (64 - prev_lead - prev_len)
        prev_bits ^= x
        vals.append(struct.unpack("<d", struct.pack("<Q", prev_bits))[0])
    return ts, vals


def compress_series(
    df,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    block_hours: int | None = None,
):
    """DataFrame -> (key, t_min, t_max, n_points, n_bytes, payload)
    Gorilla blocks: ONE shuffle on the grouping key, each block
    compresses sequentially inside its ``applyInPandas`` group (the
    paper's per-series constraint), blocks in parallel.  Timestamps
    encode as microsecond epochs; in-block order is (ts, value) —
    deterministic for any input order.

    ``block_hours`` bounds block size by TIME WINDOW (key x window
    groups): at archive scale one block per series is unbounded, and
    windowed blocks are what make range reads cheap — ``t_min/t_max``
    are the block's pruning statistics, the same min/max role parquet
    row-group stats play, so :func:`decompress_range` decompresses only
    overlapping blocks.  ``None`` keeps one block per series (small
    series / interop)."""
    import pandas as pd

    from pyspark.sql import functions as F

    group_cols = [key_col] + (["_blk"] if block_hours else [])

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_us", value_col])
        payload = gorilla_compress(
            [int(x) for x in pdf["_us"]],
            [float(x) for x in pdf[value_col]],
        )
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "t_min": [int(pdf["_us"].iloc[0])],
                "t_max": [int(pdf["_us"].iloc[-1])],
                "n_points": [len(pdf)],
                "n_bytes": [len(payload)],
                "payload": [payload],
            }
        )

    # tz-naive parquet surfaces TIMESTAMP_NTZ, which unix_micros rejects;
    # session tz is pinned UTC so the cast is value-preserving
    prepared = df.select(
        key_col,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        value_col,
    )
    if block_hours:
        prepared = prepared.withColumn(
            "_blk", F.floor(F.col("_us") / (block_hours * 3_600_000_000))
        )
    schema = (
        f"{key_col} string, t_min long, t_max long, "
        "n_points long, n_bytes long, payload binary"
    )
    return prepared.groupBy(*group_cols).applyInPandas(pack, schema=schema)


def decompress_series(
    archive,
    key_col: str = "event_type",
):
    """The mirror explode: (key, payload) -> one row per point
    (key, ts, value), ``mapInPandas`` row-local."""
    import pandas as pd

    from pyspark.sql import functions as F

    def unpack(batches):
        for pdf in batches:
            keys, tss, vs = [], [], []
            for k, p in zip(pdf[key_col], pdf["payload"]):
                ts, vals = gorilla_decompress(bytes(p))
                keys += [k] * len(ts)
                tss += ts
                vs += vals
            yield pd.DataFrame({key_col: keys, "_us": tss, "value": vs})

    out = archive.select(key_col, "payload").mapInPandas(
        unpack, schema=f"{key_col} string, _us long, value double"
    )
    return out.select(
        key_col,
        F.timestamp_micros(F.col("_us")).alias("ts"),
        "value",
    )


def decompress_range(
    archive,
    t0,
    t1,
    key_col: str = "event_type",
):
    """Time-range read over a blocked archive: the ``t_min/t_max`` block
    statistics prune non-overlapping blocks BEFORE any decompression
    (planning-level row filtering, like parquet row-group min/max), then
    the surviving blocks decompress and a point-level filter trims the
    block edges.  ``t0``/``t1`` are inclusive timestamps (strings or
    timestamp values)."""
    from pyspark.sql import functions as F

    lo = F.unix_micros(F.lit(t0).cast("timestamp"))
    hi = F.unix_micros(F.lit(t1).cast("timestamp"))
    pruned = archive.filter(
        (F.col("t_max") >= lo) & (F.col("t_min") <= hi)
    )
    pts = decompress_series(pruned, key_col=key_col)
    return pts.filter(
        (F.col("ts") >= F.lit(t0).cast("timestamp"))
        & (F.col("ts") <= F.lit(t1).cast("timestamp"))
    )


def recompact_archive(
    archive,
    key_col: str = "event_type",
    block_hours: int | None = 24,
):
    """Merge a FRAGMENTED archive (e.g. the per-epoch blocks a streaming
    archiver appends — one block per key per micro-batch) back into
    consolidated windowed blocks: decompress -> re-compress under the
    target blocking.  Same observable points, a fraction of the block
    count and better intra-block compression (longer runs amortize the
    XOR windows).  The Gorilla twin of ``sinks.compact_table``'s
    small-files pass; run it on the archive table on the same
    maintenance cadence."""
    return compress_series(
        decompress_series(archive, key_col=key_col),
        key_col=key_col,
        block_hours=block_hours,
    )


# The Spark wrappers' worker-side closures call the module-level codec
# functions; cloudpickle serializes module-level functions BY REFERENCE,
# which breaks on executors whose Python cannot import this package
# (driver harnesses running from another cwd).  Every other Python-UDF
# in the repo is a self-contained nested function; the codec is too big
# to nest, so register this module for by-VALUE pickling instead — the
# whole module ships inside the serialized task (a few KB).
try:  # pragma: no cover - depends on the pyspark vendored pickler
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001 - serialization fallback is by-reference
    pass
