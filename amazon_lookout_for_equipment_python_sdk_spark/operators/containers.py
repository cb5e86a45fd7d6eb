"""Media CONTAINER layer: AVI/MJPEG mux+demux, minimal MP4 (ISO BMFF)
mux+demux, MP3 frame indexing — stdlib + numpy only.

Container parsing is the half of "video/audio at 100 TB" that does not
need a heavyweight codec: splitting a file into per-sample byte ranges,
timing, and codec identity is what the distributed pipeline needs to
plan frame sampling, shard work, and route payloads — and it is exactly
the part that must run *inside* Arrow batches on executors.  The codec
matrix after this module:

- AVI/MJPEG: FULL encode+decode — each '00dc' chunk is a baseline JPEG,
  handled by the in-repo codec (operators/_jpeg.py), so a real video
  format round-trips end-to-end with zero dependencies.
- MP4: demux REAL (box walk, stsd/stts/stsz/stco sample tables ->
  per-sample byte ranges + timing), decode of the H.264/HEVC payload
  remains the declared NotImplementedError seam (swap in PyAV).
- MP3: frame-header INDEX real (sync scan, bitrate/samplerate/duration,
  per-frame byte ranges); audio decode remains the declared seam.

The reference has no audio/video at all (its plot.py/dataset.py are
pandas-only) — this layer exists for the §2.14 training-data-pipeline
north star.
"""

from __future__ import annotations

import struct

import numpy as np

# --- AVI / MJPEG ------------------------------------------------------------


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", list_type + data)


def encode_avi_mjpeg(
    frames: "list[np.ndarray]", fps: int = 30, quality: int = 85
) -> bytes:
    """(h, w, 3) uint8 RGB frames -> AVI with one MJPEG video stream.

    Every frame compresses through the in-repo baseline JPEG encoder and
    lands as a '00dc' chunk; a standard idx1 keyframe index follows the
    movi list (every MJPEG frame is a keyframe)."""
    from ._jpeg import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    payloads = [encode_jpeg(f, quality=quality) for f in frames]

    movi_body = bytearray(b"movi")
    index = []
    for p in payloads:
        index.append((len(movi_body), len(p)))  # offset of '00dc' fourcc
        movi_body += _chunk(b"00dc", p)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,            # microseconds per frame
        sum(len(p) for p in payloads) * fps // max(len(payloads), 1),
        0,
        0x10,                        # AVIF_HASINDEX
        len(payloads),
        0,
        1,
        max(len(p) for p in payloads),
        w,
        h,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps,                      # scale, rate -> fps = rate/scale
        0, len(payloads),
        max(len(p) for p in payloads),
        0xFFFFFFFF,                  # quality: default
        0,
        0, 0, np.int16(w), np.int16(h),
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, size)
        for off, size in index
    )
    riff_body = (
        b"AVI " + hdrl + _chunk(b"LIST", bytes(movi_body)) + _chunk(b"idx1", idx1)
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(payload: bytes) -> tuple["list[np.ndarray]", int]:
    """AVI -> (RGB frames, fps).  MJPEG streams decode fully via the
    in-repo JPEG codec; any other video fourcc raises
    NotImplementedError naming the codec (the compressed-video seam).

    The demux walks the movi list directly (no reliance on idx1, whose
    offset convention varies between muxers)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI file")
    from .multimodal import decode_image

    fps = 30
    handler = None
    frames: list[np.ndarray] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal fps, handler
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
            body = buf[pos + 8 : pos + 8 + size]
            if fourcc == b"LIST":
                walk(buf, pos + 12, pos + 8 + size)
            elif fourcc == b"strh":
                ftype, fhandler = body[:4], body[4:8]
                if ftype == b"vids":
                    handler = fhandler
                    scale, rate = struct.unpack("<II", body[20:28])
                    if scale:
                        fps = max(1, rate // scale)
            elif fourcc in (b"00dc", b"00db"):
                if handler not in (b"MJPG", b"mjpg"):
                    raise NotImplementedError(
                        f"AVI video codec {handler!r} not supported "
                        "(MJPG only; swap in PyAV for others)"
                    )
                frames.append(decode_image(bytes(body)))
            pos += 8 + size + (size % 2)

    walk(payload, 12, len(payload))
    return frames, fps


# --- minimal MP4 (ISO BMFF) -------------------------------------------------


def _box(typ: bytes, data: bytes) -> bytes:
    return struct.pack(">I", 8 + len(data)) + typ + data


def _full(typ: bytes, version: int, flags: int, data: bytes) -> bytes:
    return _box(typ, struct.pack(">I", (version << 24) | flags) + data)


def mux_mp4(
    samples: "list[bytes]",
    codec: str = "avc1",
    timescale: int = 30_000,
    sample_delta: int = 1_000,
    width: int = 0,
    height: int = 0,
) -> bytes:
    """Minimal single-track ISO BMFF writer: ftyp + mdat + moov with the
    full sample-table suite (stsd/stts/stsc/stsz/stco).  The sample
    payloads are opaque (this layer does not encode video) — the point
    is a REAL, demuxable MP4 structure for the container tests and for
    round-tripping sample streams through storage."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_data = b"".join(samples)
    mdat = _box(b"mdat", mdat_data)
    chunk_offset = len(ftyp) + 8  # first sample byte inside mdat

    n = len(samples)
    duration = n * sample_delta
    entry = _box(
        codec.encode("ascii"),
        b"\x00" * 6
        + struct.pack(">H", 1)       # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)       # frame count
        + b"\x00" * 32               # compressor name
        + struct.pack(">Hh", 24, -1),
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, sample_delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    url = _full(b"url ", 0, 1, b"")  # self-contained
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(
        b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"video\x00"
    )
    mdhd = _full(
        b"mdhd",
        0,
        0,
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        0,
        7,
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk_boxes(buf: bytes, pos: int, end: int):
    while pos + 8 <= end:
        size, typ = struct.unpack(">I4s", buf[pos : pos + 8])
        if size == 1:  # 64-bit largesize
            size = struct.unpack(">Q", buf[pos + 8 : pos + 16])[0]
            yield typ, pos + 16, pos + size
        elif size == 0:  # to end of enclosing box
            yield typ, pos + 8, end
            return
        else:
            yield typ, pos + 8, pos + size
        pos += max(size, 8)


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def demux_mp4(payload: bytes) -> dict:
    """ISO BMFF demux: box walk -> per-track codec fourcc, timescale,
    duration, and per-sample (offset, size, dts) derived from
    stts/stsz/stsc/stco.  Returns
    ``{"brand", "tracks": [{"codec", "timescale", "duration",
    "samples": [(offset, size, dts), ...]}]}``.

    Covers the common single-stsc-run layout (what mux_mp4 writes and
    what faststart encoders emit for constant chunking); decoding the
    codec payloads themselves (H.264/HEVC/AAC) is the declared seam —
    this function is how a pipeline gets the byte ranges to hand a real
    decoder."""
    brand = None
    tracks: list[dict] = []
    state: dict | None = None

    def walk(pos: int, end: int) -> None:
        nonlocal brand, state
        for typ, s, e in _walk_boxes(payload, pos, end):
            body = payload[s:e]
            if typ == b"ftyp":
                brand = body[:4].decode("ascii", "replace")
            elif typ == b"trak":
                state = {
                    "codec": None,
                    "timescale": None,
                    "duration": None,
                    "_stts": [],
                    "_sizes": [],
                    "_offsets": [],
                }
                walk(s, e)
                sizes, offs = state["_sizes"], state["_offsets"]
                dts, cur = [], 0
                for count, delta in state["_stts"]:
                    for _ in range(count):
                        dts.append(cur)
                        cur += delta
                dts += [cur] * (len(sizes) - len(dts))
                # single-run stsc: chunk 1 holds all samples sequentially
                samples = []
                off = offs[0] if offs else 0
                for i, sz in enumerate(sizes):
                    samples.append((off, sz, dts[i]))
                    off += sz
                state["samples"] = samples
                for k in ("_stts", "_sizes", "_offsets"):
                    del state[k]
                tracks.append(state)
                state = None
            elif typ in _MP4_CONTAINERS:
                walk(s, e)
            elif state is not None:
                if typ == b"mdhd":
                    version = body[0]
                    if version == 1:
                        ts, dur = struct.unpack(">IQ", body[20:32])
                    else:
                        ts, dur = struct.unpack(">II", body[12:20])
                    state["timescale"], state["duration"] = ts, dur
                elif typ == b"stsd":
                    n = struct.unpack(">I", body[4:8])[0]
                    if n >= 1:
                        state["codec"] = body[12:16].decode("ascii", "replace")
                elif typ == b"stts":
                    n = struct.unpack(">I", body[4:8])[0]
                    for i in range(n):
                        c, d = struct.unpack(
                            ">II", body[8 + 8 * i : 16 + 8 * i]
                        )
                        state["_stts"].append((c, d))
                elif typ == b"stsz":
                    fixed, n = struct.unpack(">II", body[4:12])
                    if fixed:
                        state["_sizes"] = [fixed] * n
                    else:
                        state["_sizes"] = list(
                            struct.unpack(f">{n}I", body[12 : 12 + 4 * n])
                        )
                elif typ == b"stco":
                    n = struct.unpack(">I", body[4:8])[0]
                    state["_offsets"] = list(
                        struct.unpack(f">{n}I", body[8 : 8 + 4 * n])
                    )
                elif typ == b"co64":
                    n = struct.unpack(">I", body[4:8])[0]
                    state["_offsets"] = list(
                        struct.unpack(f">{n}Q", body[8 : 8 + 8 * n])
                    )

    walk(0, len(payload))
    return {"brand": brand, "tracks": tracks}


# --- MP3 frame index --------------------------------------------------------

_MP3_BITRATES = [
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]  # kbit/s, MPEG-1 Layer III
_MP3_RATES = [44100, 48000, 32000]


def mp3_frame_index(payload: bytes) -> dict:
    """MPEG-1 Layer III frame scan: locate every frame header (11-bit
    sync + consistency checks), derive per-frame byte ranges, and report
    ``{"frames": [(offset, size), ...], "sample_rate", "duration_s",
    "bitrate_kbps_mean"}``.  An ID3v2 tag at the front is skipped by
    size.  Decoding the audio itself is the declared seam — this is the
    metadata/split layer a distributed pipeline needs (duration
    bucketing, shard planning, byte-range routing)."""
    pos = 0
    if payload[:3] == b"ID3":
        syncsafe = payload[6:10]
        pos = 10 + (
            (syncsafe[0] << 21)
            | (syncsafe[1] << 14)
            | (syncsafe[2] << 7)
            | syncsafe[3]
        )
    frames: list[tuple[int, int]] = []
    rate = None
    kbps: list[int] = []
    while pos + 4 <= len(payload):
        b0, b1, b2, _b3 = payload[pos : pos + 4]
        if b0 == 0xFF and (b1 & 0xFE) == 0xFA:  # MPEG-1 (11-bit sync + v1 L3)
            br_idx = (b2 >> 4) & 0xF
            sr_idx = (b2 >> 2) & 0x3
            padding = (b2 >> 1) & 0x1
            if 0 < br_idx < 15 and sr_idx < 3:
                br = _MP3_BITRATES[br_idx] * 1000
                sr = _MP3_RATES[sr_idx]
                size = 144 * br // sr + padding
                if rate is None:
                    rate = sr
                if sr == rate and pos + size <= len(payload):
                    frames.append((pos, size))
                    kbps.append(br // 1000)
                    pos += size
                    continue
        if frames:
            break  # trailing garbage after a valid frame run (e.g. ID3v1)
        pos += 1
    duration = len(frames) * 1152 / rate if rate else 0.0
    return {
        "frames": frames,
        "sample_rate": rate,
        "duration_s": duration,
        "bitrate_kbps_mean": (sum(kbps) / len(kbps)) if kbps else None,
    }
