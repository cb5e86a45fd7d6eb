"""Gorilla time-series codec (operators/gorilla.py): bit-exact round
trips (property-based), compression ratio on sensor-like data, Spark
archive round trip."""

from __future__ import annotations

import math
import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from amazon_lookout_for_equipment_python_sdk_spark.operators.gorilla import (
    compress_series,
    decompress_series,
    gorilla_compress,
    gorilla_decompress,
)


def _bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", x))[0]


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.floats(allow_nan=True, allow_infinity=True, width=64),
        ),
        max_size=200,
    )
)
@settings(max_examples=200, deadline=None)
def test_round_trip_property(points):
    ts = sorted(t for t, _ in points)
    vals = [v for _, v in points]
    back_ts, back_vals = gorilla_decompress(gorilla_compress(ts, vals))
    assert back_ts == ts
    # bit-exact, including NaN payloads and signed zeros
    assert [_bits(v) for v in back_vals] == [_bits(v) for v in vals]


def test_compression_ratio_on_sensor_like_series():
    """The Gorilla sweet spot — regular cadence, quantized
    slowly-drifting readings (~85% exact repeats, the production shape
    the paper reports 1.37 bytes/point on): must beat 10x vs raw
    (ts int64 + value f64 = 128 bits/point; measured ~9 bits/point)."""
    rng = np.random.default_rng(8)
    n = 10_000
    ts = np.arange(n) * 60_000_000
    base = 100 + np.cumsum(rng.normal(0, 0.02, n))
    vals = np.round(base * 10) / 10  # 0.1-step sensor quantization
    payload = gorilla_compress([int(t) for t in ts], [float(v) for v in vals])
    raw = n * 16
    assert len(payload) * 10 < raw, (len(payload), raw)
    bts, bvs = gorilla_decompress(payload)
    assert bts == [int(t) for t in ts]
    assert bvs == [float(v) for v in vals]


def test_incompressible_data_bounded_overhead():
    """Random values are Gorilla's worst case: the cost must stay within
    ~8% of raw (control bits), never blow up."""
    rng = np.random.default_rng(9)
    n = 2_000
    ts = np.sort(rng.integers(0, 30 * 86_400 * 1_000_000, n))
    vals = np.round(rng.uniform(0, 200, n), 2)
    payload = gorilla_compress([int(t) for t in ts], [float(v) for v in vals])
    assert len(payload) <= int(n * 16 * 1.08) + 32
    bts, bvs = gorilla_decompress(payload)
    assert bts == [int(t) for t in ts] and bvs == [float(v) for v in vals]


def test_constant_series_is_near_two_bits_per_point():
    n = 5_000
    ts = [i * 1_000_000 for i in range(n)]
    vals = [42.5] * n
    payload = gorilla_compress(ts, vals)
    # header 20 bytes + ~2 bits/point
    assert len(payload) < 20 + n // 3


def test_spark_archive_round_trip(spark, sf_dir):
    from amazon_lookout_for_equipment_python_sdk_spark.plans.registry import load

    events = load(spark, sf_dir, "events").filter("value IS NOT NULL")
    archive = compress_series(events)
    rows = archive.collect()
    assert {r["event_type"] for r in rows} == {
        r["event_type"]
        for r in events.select("event_type").distinct().collect()
    }
    total_points = sum(r["n_points"] for r in rows)
    assert total_points == events.count()
    # events values are uniform-random (incompressible); the archive
    # must stay within the bounded-overhead envelope regardless
    for r in rows:
        assert r["n_bytes"] <= int(r["n_points"] * 16 * 1.08) + 32
    back = decompress_series(archive)
    import pyspark.sql.functions as F

    a = events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.unix_micros("ts")).alias("ts_sum"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    b = back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.unix_micros("ts")).alias("ts_sum"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_blocked_archive_range_read_prunes_before_decompress(spark, sf_dir):
    """Windowed blocks + t_min/t_max stats: a range read must decompress
    ONLY overlapping blocks (pruning observable in block counts) and
    return exactly the raw rows in range."""
    import pyspark.sql.functions as F

    from amazon_lookout_for_equipment_python_sdk_spark.operators.gorilla import (
        decompress_range,
    )
    from amazon_lookout_for_equipment_python_sdk_spark.plans.registry import load

    events = load(spark, sf_dir, "events").filter("value IS NOT NULL")
    archive = compress_series(events, block_hours=24)
    n_blocks = archive.count()
    assert n_blocks > 5  # genuinely windowed
    # conservation: blocked archive holds every point exactly once
    assert (
        archive.agg(F.sum("n_points")).first()[0] == events.count()
    )
    t0, t1 = "2024-01-03 00:00:00", "2024-01-04 23:59:59"
    got = decompress_range(archive, t0, t1)
    want = events.filter(
        (F.col("ts") >= F.lit(t0).cast("timestamp"))
        & (F.col("ts") <= F.lit(t1).cast("timestamp"))
    )
    assert got.count() == want.count() > 0
    # pruning: the overlapping-block set is a strict subset
    lo = F.unix_micros(F.lit(t0).cast("timestamp"))
    hi = F.unix_micros(F.lit(t1).cast("timestamp"))
    surviving = archive.filter(
        (F.col("t_max") >= lo) & (F.col("t_min") <= hi)
    ).count()
    assert 0 < surviving < n_blocks
    # value-level equivalence on checksums
    a = want.agg(
        F.sum(F.unix_micros(F.col("ts").cast("timestamp"))).alias("t"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"),
    ).first()
    b = got.agg(
        F.sum(F.unix_micros("ts")).alias("t"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"),
    ).first()
    assert (a["t"], a["c"]) == (b["t"], b["c"])


def test_recompact_merges_fragmented_blocks(spark):
    """Per-batch fragmented blocks consolidate into per-window blocks:
    fewer rows, identical points, no worse total bytes."""
    import pyspark.sql.functions as F

    from amazon_lookout_for_equipment_python_sdk_spark.operators.gorilla import (
        recompact_archive,
    )

    base = 1_700_000_000
    rows = [("a", base + i * 60, 100.0 + (i % 7) / 10) for i in range(600)]
    df = spark.createDataFrame(
        rows, "k string, tsec long, value double"
    ).select("k", F.timestamp_seconds("tsec").alias("ts"), "value")
    # simulate 6 streaming epochs: compress 100-row slices separately
    frags = None
    for i in range(6):
        part = compress_series(
            df.filter(
                (F.col("ts") >= F.timestamp_seconds(F.lit(base + i * 100 * 60)))
                & (F.col("ts") < F.timestamp_seconds(F.lit(base + (i + 1) * 100 * 60)))
            ),
            key_col="k",
            block_hours=1,
        )
        frags = part if frags is None else frags.unionByName(part)
    n_frag = frags.count()
    compacted = recompact_archive(frags, key_col="k", block_hours=24)
    assert compacted.count() < n_frag
    assert (
        compacted.agg(F.sum("n_points")).first()[0]
        == frags.agg(F.sum("n_points")).first()[0]
        == 600
    )
    a = sorted(map(tuple, decompress_series(frags, key_col="k").collect()))
    b = sorted(map(tuple, decompress_series(compacted, key_col="k").collect()))
    assert a == b
    assert (
        compacted.agg(F.sum("n_bytes")).first()[0]
        <= frags.agg(F.sum("n_bytes")).first()[0]
    )


@given(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2**40),
                st.floats(allow_nan=True, allow_infinity=True, width=64),
            ),
            max_size=40,
        ),
        max_size=8,
    )
)
@settings(max_examples=100, deadline=None)
def test_decompress_blocks_matches_per_block(blocks):
    """The batch decoder (decompress_series' r15 array path) must return
    exactly the per-block gorilla_decompress streams, concatenated in
    input order — including empty, single-point, and NaN-payload
    blocks."""
    from amazon_lookout_for_equipment_python_sdk_spark.operators.gorilla import (
        gorilla_decompress_blocks,
    )

    payloads, ref_ns, ref_ts, ref_vb = [], [], [], []
    for points in blocks:
        ts = sorted(t for t, _ in points)
        vals = [v for _, v in points]
        payloads.append(gorilla_compress(ts, vals))
        t, v = gorilla_decompress(payloads[-1])
        ref_ns.append(len(t))
        ref_ts += t
        ref_vb += [_bits(x) for x in v]
    ns, ts_arr, vals_arr = gorilla_decompress_blocks(payloads)
    assert list(ns) == ref_ns
    assert ts_arr.tolist() == ref_ts
    assert vals_arr.view(np.uint64).tolist() == ref_vb


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.floats(allow_nan=True, allow_infinity=True, width=64),
        ),
        max_size=200,
    )
)
@settings(max_examples=200, deadline=None)
def test_vectorized_codec_matches_scalar_spec(points):
    """The r7 vectorized encode/decode must be BYTE-identical to the
    original scalar implementation (kept as _gorilla_compress_py /
    _gorilla_decompress_py, the executable spec) — archives written by
    either decode under both."""
    from amazon_lookout_for_equipment_python_sdk_spark.operators.gorilla import (
        _gorilla_compress_py,
        _gorilla_decompress_py,
    )

    ts = sorted(t for t, _ in points)
    vals = [v for _, v in points]
    fast = gorilla_compress(ts, vals)
    slow = _gorilla_compress_py(ts, vals)
    assert fast == slow
    ft, fv = gorilla_decompress(slow)
    st_, sv = _gorilla_decompress_py(fast)
    assert ft == st_ == ts
    assert [_bits(v) for v in fv] == [_bits(v) for v in sv] == [
        _bits(v) for v in vals
    ]


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.floats(allow_nan=True, allow_infinity=True, width=64),
        ),
        max_size=200,
    )
)
@settings(max_examples=150, deadline=None)
def test_native_decoder_matches_python_walk(points):
    """The guarded C decoder (r16) and the pure-Python walk must agree
    bit-for-bit on every payload — the env flag pins BOTH paths in one
    process (the native holder is checked per call)."""
    import os

    from amazon_lookout_for_equipment_python_sdk_spark.operators.gorilla import (
        _gorilla_decompress_arrays,
        _native_gorilla,
    )

    ts = sorted(t for t, _ in points)
    vals = [v for _, v in points]
    payload = gorilla_compress(ts, vals)
    nat_ts, nat_vs = _gorilla_decompress_arrays(payload)
    prev = os.environ.get("SPARKGRAFT_GORILLA_NATIVE")
    os.environ["SPARKGRAFT_GORILLA_NATIVE"] = "0"
    try:
        assert _native_gorilla() is None  # the flag must actually gate
        py_ts, py_vs = _gorilla_decompress_arrays(payload)
    finally:
        if prev is None:
            del os.environ["SPARKGRAFT_GORILLA_NATIVE"]
        else:
            os.environ["SPARKGRAFT_GORILLA_NATIVE"] = prev
    assert nat_ts.tolist() == py_ts.tolist() == ts
    assert (
        nat_vs.view(np.uint64).tolist() == py_vs.view(np.uint64).tolist()
    )


def test_native_decoder_rejects_corrupt_stream_via_fallback():
    """A structurally corrupt payload must not crash the native path:
    the C kernel returns nonzero and the caller falls back to the
    pure-Python walk (whose behaviour on the same bytes is the spec)."""
    from amazon_lookout_for_equipment_python_sdk_spark.operators.gorilla import (
        _native_gorilla,
    )

    native = _native_gorilla()
    if native is None:  # no compiler on this host — fallback already on
        return
    # '10' (window reuse) as the FIRST value tag, before any '11' set a
    # window: dod '0' bit, then '10' -> C returns 2 (guarded), Python
    # reads a zero-width field.  Build it by hand: n=2 header + payload
    # bits 0,1,0 -> byte 0b01000000.
    payload = (
        struct.pack("<IqQ", 2, 0, 0) + bytes([0b01000000])
    )
    assert native(payload, 2, 0, 0) is None  # nonzero rc -> fallback
