"""Media container layer (operators/containers.py): AVI/MJPEG full
round-trip, MP4 mux/demux sample tables, MP3 frame indexing."""

from __future__ import annotations

import numpy as np
import pytest

from amazon_lookout_for_equipment_python_sdk_spark.operators import (
    containers as ct,
)
from amazon_lookout_for_equipment_python_sdk_spark.operators import (
    multimodal as mm,
)


def _frames(n=4, h=32, w=48):
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = []
    for i in range(n):
        f = base.copy()
        f[:, : 4 * (i + 1)] = [255, 0, 0]  # moving red bar
        out.append(f)
    return out


def test_avi_mjpeg_round_trip():
    frames = _frames()
    avi = ct.encode_avi_mjpeg(frames, fps=12, quality=92)
    back, fps = ct.decode_avi(avi)
    assert fps == 12 and len(back) == len(frames)
    for a, b in zip(frames, back):
        assert a.shape == b.shape
        # JPEG is lossy: demand close, not equal
        assert np.mean(np.abs(a.astype(int) - b.astype(int))) < 12


def test_decode_video_dispatches_and_mjpg_only():
    frames = _frames(n=2)
    avi = ct.encode_avi_mjpeg(frames, fps=10)
    got, fps = mm.decode_video(avi)
    assert fps == 10 and len(got) == 2
    y4m = mm.encode_y4m(frames, fps=10)
    got, fps = mm.decode_video(y4m)
    assert fps == 10 and len(got) == 2
    # foreign codec fourcc must raise, naming the codec
    bad = avi.replace(b"MJPG", b"h264")
    with pytest.raises(NotImplementedError, match="h264"):
        mm.decode_video(bad)
    with pytest.raises(ValueError):
        mm.decode_video(b"garbage")


def test_video_fingerprint_stable_across_container_reencode():
    """The clip hash must be container/codec-invariant for the same
    footage: Y4M (lossless) vs AVI/MJPEG (lossy JPEG) within a couple of
    majority bits."""
    frames = _frames(n=6)
    h1 = mm.video_fingerprint64(mm.encode_y4m(frames, fps=10))
    h2 = mm.video_fingerprint64(ct.encode_avi_mjpeg(frames, fps=10, quality=92))
    # noise-heavy synthetic frames are dHash's worst case (adjacent-pixel
    # comparisons near coin flips); the re-encode still stays well under
    # the distinct-footage separation below
    assert bin(h1 ^ h2).count("1") <= 6
    other = mm.video_fingerprint64(
        mm.encode_y4m([f[::-1].copy() for f in frames], fps=10)
    )
    assert bin(h1 ^ other).count("1") >= 10


def test_mp4_mux_demux_round_trip():
    samples = [b"\x00\x01frame0", b"frame1!", b"f2" * 10]
    mp4 = ct.mux_mp4(
        samples, codec="avc1", timescale=30_000, sample_delta=1_001,
        width=640, height=480,
    )
    meta = ct.demux_mp4(mp4)
    assert meta["brand"] == "isom"
    (trk,) = meta["tracks"]
    assert trk["codec"] == "avc1"
    assert trk["timescale"] == 30_000
    assert trk["duration"] == 3 * 1_001
    got = [mp4[o : o + s] for o, s, _dts in trk["samples"]]
    assert got == samples
    assert [d for _o, _s, d in trk["samples"]] == [0, 1_001, 2_002]
    # the sample payload decode is the declared seam
    with pytest.raises(NotImplementedError, match="demux_mp4"):
        mm.decode_video(mp4)


def _mp3_frame(bitrate_idx=9, sr_idx=0, padding=0):
    hdr = bytes(
        [0xFF, 0xFB, (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1), 0xC4]
    )
    size = 144 * (ct._MP3_BITRATES[bitrate_idx] * 1000) // ct._MP3_RATES[sr_idx]
    return hdr + b"\x00" * (size + padding - 4)


def test_mp3_frame_index():
    stream = b"ID3" + bytes([4, 0, 0, 0, 0, 0, 10]) + b"\x00" * 10
    stream += _mp3_frame() * 37 + _mp3_frame(padding=1) * 2
    idx = ct.mp3_frame_index(stream)
    assert len(idx["frames"]) == 39
    assert idx["sample_rate"] == 44100
    assert abs(idx["duration_s"] - 39 * 1152 / 44100) < 1e-9
    assert idx["bitrate_kbps_mean"] == 128.0
    # byte ranges tile the audio region exactly
    offs = idx["frames"]
    for (o1, s1), (o2, _s2) in zip(offs, offs[1:]):
        assert o1 + s1 == o2


def test_container_parsers_fail_cleanly_on_garbage():
    """A 100 TB ingest sees truncated/corrupt payloads constantly: every
    parser must raise a catchable error or return a degenerate result —
    never hang or die on an uncatchable internal error."""
    import struct

    from hypothesis import given, settings
    from hypothesis import strategies as st

    ok_errors = (ValueError, NotImplementedError, struct.error, IndexError)

    @given(st.binary(max_size=400))
    @settings(max_examples=300, deadline=None)
    def fuzz(payload):
        for fn in (ct.decode_avi, ct.demux_mp4, ct.mp3_frame_index):
            try:
                fn(payload)
            except ok_errors:
                pass
        # prefixed with real magic bytes to reach deeper branches
        for prefix, fn in (
            (b"RIFF\x20\x00\x00\x00AVI ", ct.decode_avi),
            (struct.pack(">I", 16) + b"ftypisom", ct.demux_mp4),
        ):
            try:
                fn(prefix + payload)
            except ok_errors:
                pass

    fuzz()


def test_avi_round_trip_property_random_dims():
    """AVI/MJPEG round trip across random (odd) frame geometries — the
    JPEG MCU-padding edges — and frame counts."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.integers(min_value=9, max_value=33),
        st.integers(min_value=9, max_value=33),
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=0, max_value=2**31),
    )
    @settings(max_examples=12, deadline=None)
    def roundtrip(h, w, n, seed):
        rng = np.random.default_rng(seed)
        frames = [
            rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            for _ in range(n)
        ]
        back, fps = ct.decode_avi(ct.encode_avi_mjpeg(frames, fps=7, quality=95))
        assert fps == 7 and len(back) == n
        for a, b in zip(frames, back):
            assert b.shape == (h, w, 3)
            assert np.mean(np.abs(a.astype(int) - b.astype(int))) < 16

    roundtrip()
