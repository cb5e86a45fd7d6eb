"""Runnable tour of the r6 media + archive layers on the bundled testdata.

    python docs/examples/media_archive_demo.py [sf_dir]

Media half: synthesize two short clips, ship one as Y4M and the same
footage re-encoded as AVI/MJPEG (the in-repo JPEG codec), fingerprint
both through the format-dispatching decoder — the container must not
change the clip identity — then demux an MP4 down to its sample byte
ranges and index a synthetic MP3 stream without any codec.

Archive half: Gorilla-compress the events table per signal (one row per
series), decompress it back bit-exact, and LTTB-downsample each series
to plot-sized points — the 100 TB dashboard path.
"""

from __future__ import annotations

import os
import struct
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.session import get_spark
from amazon_lookout_for_equipment_python_sdk_spark.operators import (
    containers as ct,
    multimodal as mm,
)
from amazon_lookout_for_equipment_python_sdk_spark.operators.gorilla import (
    compress_series,
    decompress_series,
)
from amazon_lookout_for_equipment_python_sdk_spark.plot.downsample import (
    downsample_series,
)


def _clip(seed: int, n: int = 6, h: int = 32, w: int = 48):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    frames = []
    for i in range(n):
        f = base.copy()
        f[:, : 4 * (i + 1)] = [255, 0, 0]
        frames.append(f)
    return frames


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("media-archive-demo", cpus=4)

    # --- media: same footage through two containers -----------------------
    clip_a, clip_b = _clip(1), _clip(2)
    media = spark.createDataFrame(
        [
            (1, "video", mm.encode_y4m(clip_a, fps=10)),
            (2, "video", ct.encode_avi_mjpeg(clip_a, fps=10, quality=92)),
            (3, "video", mm.encode_y4m(clip_b, fps=10)),
        ],
        "media_id long, kind string, payload binary",
    )
    fps = {
        r["media_id"]: mm.video_fingerprint64(bytes(r["payload"]))
        for r in media.collect()
    }
    d12 = bin(fps[1] ^ fps[2]).count("1")
    d13 = bin(fps[1] ^ fps[3]).count("1")
    print(f"clip hash distance: same footage Y4M vs AVI = {d12} bits; "
          f"different footage = {d13} bits")
    grid = mm.extract_video_frames(media, every_ms=200)
    print("sampled frames:", grid.count(), "rows across", 3, "clips")

    # --- containers without codecs ---------------------------------------
    mp4 = ct.mux_mp4([b"nalu0", b"nalu1!", b"nalu22"], codec="avc1",
                     timescale=30_000, sample_delta=1_001)
    meta = ct.demux_mp4(mp4)
    trk = meta["tracks"][0]
    print(f"mp4 demux: brand={meta['brand']} codec={trk['codec']} "
          f"samples={[(o, s) for o, s, _ in trk['samples']]}")
    hdr = bytes([0xFF, 0xFB, (9 << 4) | 0, 0xC4])
    frame = hdr + b"\x00" * (144 * 128_000 // 44_100 - 4)
    idx = ct.mp3_frame_index(frame * 25)
    print(f"mp3 index: {len(idx['frames'])} frames, "
          f"{idx['duration_s']:.2f}s @ {idx['bitrate_kbps_mean']:.0f} kbps")

    # --- archive: Gorilla + LTTB ------------------------------------------
    events = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        "value IS NOT NULL"
    )
    archive = compress_series(events)
    stats = archive.select(
        F.sum("n_points").alias("pts"), F.sum("n_bytes").alias("bytes")
    ).first()
    print(f"gorilla archive: {stats['pts']} points -> {stats['bytes']} bytes "
          f"({stats['bytes'] * 8 / stats['pts']:.1f} bits/point)")
    back = decompress_series(archive)
    assert back.count() == stats["pts"]
    plot_pts = downsample_series(back, n_out=500)
    print("plot-ready points per signal:")
    plot_pts.groupBy("event_type").count().orderBy("event_type").show()


if __name__ == "__main__":
    main()
