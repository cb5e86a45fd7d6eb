"""Offline Gorilla DECODE profile on the bench blocking (no Spark).

Rebuilds exactly the blocks the registered ``gorilla_roundtrip_stats``
query produces at the given SF (event_type x 24h window, in-block order
(ts, value)) with pandas, then times the block decode path single-
threaded.  This isolates the per-point walk the r15 "Not yet optimized"
ledger names (~0.28 s per 20k-pt block on the r15 box) from all Spark
machinery.

Usage: python tools/profile_gorilla_decode.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amazon_lookout_for_equipment_python_sdk_spark.operators.gorilla import (  # noqa: E402
    _gorilla_decompress_arrays,
    gorilla_compress,
    gorilla_decompress_blocks,
)


def build_blocks(sf_dir: str):
    ev = pd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts", "value"],
    )
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    ev = ev.assign(_us=us, _blk=us // (24 * 3_600_000_000))
    payloads = []
    for (_et, _b), g in ev.groupby(["event_type", "_blk"], sort=True):
        g = g.sort_values(["_us", "value"])
        payloads.append(
            gorilla_compress(g["_us"].to_numpy(), g["value"].to_numpy())
        )
    return payloads


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    payloads = build_blocks(sf_dir)
    npts = []
    for p in payloads:
        import struct

        npts.append(struct.unpack_from("<I", p, 0)[0])
    print(
        f"{len(payloads)} blocks, {sum(npts)} points total, "
        f"sizes={sorted(npts, reverse=True)[:8]}"
    )
    native = os.environ.get("SPARKGRAFT_GORILLA_NATIVE", "<unset>")
    print(f"SPARKGRAFT_GORILLA_NATIVE={native}")
    # warm once (compile/load of any native kernel happens here, outside
    # the timed reps — same role as the JVM warmup in bench.py)
    _gorilla_decompress_arrays(payloads[0])
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        ns, ts, vs = gorilla_decompress_blocks(payloads)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"rep {r}: {dt:.4f} s  ({sum(npts) / dt / 1e6:.2f} Mpt/s)")
    print(
        f"best: {best:.4f} s single-threaded, "
        f"{sum(npts) / best / 1e6:.2f} Mpt/s, checksum "
        f"{int(ts.sum()) & 0xFFFFFFFF:#x}/{float(np.nansum(vs)):.6g}"
    )


if __name__ == "__main__":
    main()
