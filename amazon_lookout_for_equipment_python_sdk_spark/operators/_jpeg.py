"""Baseline JPEG codec, stdlib+numpy only (no Pillow/libjpeg in-sandbox).

Scope: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr 4:4:4
(no chroma subsampling), Huffman entropy coding.  The decoder reads the
quantization and Huffman tables FROM THE FILE (DQT/DHT markers), so it
decodes real-world baseline 4:4:4 JPEGs, not just this encoder's output;
progressive (SOF2), subsampled, arithmetic-coded, and restart-interval
streams raise NotImplementedError — the documented Pillow swap-in seam.

Lossy by design: round-trip tests assert closeness (mean abs error), not
equality — unlike the exact BMP/PPM/PNG/WAV codecs in multimodal.py.

Used per-payload inside Arrow-batched mapInPandas (multimodal.py), so all
cost is row-local; nothing here touches Spark.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants --------------------------------------------------------------

#: Annex K quantization tables (luminance, chrominance), row-major
QUANT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

QUANT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

#: standard Huffman specs (T.81 Annex K): (bits[1..16], symbols)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _zigzag_order() -> np.ndarray:
    """The 64-entry zigzag permutation, generated (not hardcoded) by the
    diagonal walk — index i of the output holds the (row, col) rank in
    zigzag order."""
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (
            rc[0] + rc[1],
            rc[1] if (rc[0] + rc[1]) % 2 == 0 else rc[0],
        ),
    )
    flat = np.empty(64, dtype=np.int64)
    for rank, (r, c) in enumerate(order):
        flat[rank] = r * 8 + c
    return flat


ZIGZAG = _zigzag_order()

#: 8x8 DCT-II basis matrix: block_dct = T @ block @ T.T
_T = np.zeros((8, 8))
for _u in range(8):
    _alpha = np.sqrt(0.25) if _u else np.sqrt(0.125)
    for _x in range(8):
        _T[_u, _x] = _alpha * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


# --- bit IO -----------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise EOFError("marker inside entropy data")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


# --- Huffman ----------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) canonical assignment."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol lookup for the reader."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category, bits) per T.81 F.1.2.1 (negatives one's-comp)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


# --- encoder ----------------------------------------------------------------


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[:, :, 0], ycc[:, :, 1] - 128.0, ycc[:, :, 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    # round, don't truncate: a DC quantization residue of -0.1 must not
    # knock every pixel down a full level
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(
        np.uint8
    )


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    qtab: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    prev_dc: int,
) -> int:
    """DCT + quantize + Huffman-write one 8x8 sample block; returns the
    new DC predictor."""
    coeff = _T @ (block - 128.0) @ _T.T
    quant = np.round(coeff / qtab).astype(np.int64)
    zz = quant.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - prev_dc
    cat, bits = _magnitude(diff)
    code, length = dc_codes[cat]
    writer.write(code, length)
    if cat:
        writer.write(bits, cat)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]  # ZRL
            writer.write(zc, zl)
            run -= 16
        cat, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | cat]
        writer.write(code, length)
        writer.write(bits, cat)
        run = 0
    if run:
        ec, el = ac_codes[0x00]  # EOB
        writer.write(ec, el)
    return int(zz[0])


def _pad_edge(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = plane.shape
    out = np.empty((ph, pw))
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1 : h, :]
    out[:, w:] = out[:, w - 1 : w]
    return out


def encode_jpeg(
    img: np.ndarray, quality: int = 85, subsampling: str = "444"
) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes.

    ``subsampling``: '444' (no chroma subsampling), '422' (halved
    horizontally), or '420' (halved both ways — what most real-world
    JPEGs use; ~2x smaller chroma payload)."""
    factors = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}
    if subsampling not in factors:
        raise ValueError(f"subsampling must be one of {sorted(factors)}")
    hy, vy = factors[subsampling]
    h, w, _ = img.shape
    qlum = _scaled_quant(QUANT_LUM, quality)
    qchrom = _scaled_quant(QUANT_CHROM, quality)
    ycc = _rgb_to_ycbcr(img.astype(np.float64))
    mh, mw = 8 * vy, 8 * hy  # MCU pixel dims
    ph, pw = -(-h // mh) * mh, -(-w // mw) * mw
    ypad = _pad_edge(ycc[:, :, 0], ph, pw)
    planes = [ypad]
    for c in (1, 2):
        chroma = _pad_edge(ycc[:, :, c], ph, pw)
        # box-filter downsample by (vy, hy)
        ds = chroma.reshape(ph // vy, vy, pw // hy, hy).mean(axis=(1, 3))
        planes.append(ds)
    comp_factors = [(hy, vy), (1, 1), (1, 1)]

    enc_dc = [
        _canonical_codes(DC_LUM_BITS, DC_LUM_VALS),
        _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS),
    ]
    enc_ac = [
        _canonical_codes(AC_LUM_BITS, AC_LUM_VALS),
        _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS),
    ]

    writer = _BitWriter()
    prev_dc = [0, 0, 0]
    for my in range(ph // mh):
        for mx in range(pw // mw):
            for c in range(3):
                hc, vc = comp_factors[c]
                tsel = 0 if c == 0 else 1
                qtab = qlum if c == 0 else qchrom
                for byy in range(vc):
                    for bxx in range(hc):
                        y0 = (my * vc + byy) * 8
                        x0 = (mx * hc + bxx) * 8
                        prev_dc[c] = _encode_block(
                            writer,
                            planes[c][y0 : y0 + 8, x0 : x0 + 8],
                            qtab,
                            enc_dc[tsel],
                            enc_ac[tsel],
                            prev_dc[c],
                        )
    writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return seg(
            0xFFDB, bytes([tid]) + bytes(int(x) for x in table.reshape(-1)[ZIGZAG])
        )

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    samp_y = (hy << 4) | vy
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, samp_y, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (
        b"\xff\xd8"
        + app0
        + dqt(0, qlum)
        + dqt(1, qchrom)
        + sof
        + dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
        + dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
        + dht(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
        + dht(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)
        + sos
        + bytes(writer.out)
        + b"\xff\xd9"
    )


# --- decoder ----------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB.

    Tables come from the stream's own DQT/DHT markers; 4:4:4, 4:2:2 and
    4:2:0 chroma subsampling all decode (most real-world baseline JPEGs
    are 4:2:0).  Raises NotImplementedError for progressive,
    arithmetic-coded, or restart-interval streams."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    scan_comps = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker sync lost at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        # id — skip them so the id (and its length field) are read from
        # the right offset.
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0xC2, 0xC1, 0xC3):
            raise NotImplementedError(
                "only baseline sequential (SOF0) JPEG is supported"
            )
        (ln,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                if prec:
                    raise NotImplementedError("16-bit quant tables")
                flat = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                tab = np.empty(64, dtype=np.int32)
                tab[ZIGZAG] = flat
                qtables[tid] = tab.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htables[(cls, tid)] = _decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG")
            comps = []
            for c in range(nc):
                cid, samp, qid = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0xF, qid))
            frame = (h, w, comps)
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = [(body[1 + 2 * c], body[2 + 2 * c]) for c in range(ns)]
            break
        # APPn/COM/etc: skipped
    if frame is None or scan_comps is None:
        raise ValueError("JPEG missing SOF0/SOS")
    h, w, comps = frame
    nc = len(comps)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mh, mw = 8 * vmax, 8 * hmax  # MCU pixel dims
    mcuy, mcux = -(-h // mh), -(-w // mw)
    # per-component planes at native (subsampled) resolution
    planes = [
        np.zeros((mcuy * 8 * vc, mcux * 8 * hc))
        for (_cid, hc, vc, _qid) in comps
    ]
    reader = _BitReader(payload, pos)
    prev_dc = [0] * nc

    def read_block(c: int) -> np.ndarray:
        dc_tab = htables[(0, scan_comps[c][1] >> 4)]
        ac_tab = htables[(1, scan_comps[c][1] & 0xF)]
        qtab = qtables[comps[c][3]]
        zz = np.zeros(64, dtype=np.int64)
        cat = _read_symbol(reader, dc_tab)
        diff = _extend(reader.read_bits(cat), cat) if cat else 0
        prev_dc[c] += diff
        zz[0] = prev_dc[c]
        k = 1
        while k < 64:
            sym = _read_symbol(reader, ac_tab)
            if sym == 0x00:  # EOB
                break
            run, cat = sym >> 4, sym & 0xF
            if cat == 0:
                if run != 15:
                    raise ValueError("bad AC symbol")
                k += 16  # ZRL
                continue
            k += run
            if k > 63:
                raise ValueError("AC coefficient overflow")
            zz[k] = _extend(reader.read_bits(cat), cat)
            k += 1
        coeff = np.zeros(64, dtype=np.float64)
        coeff[ZIGZAG] = zz
        return _T.T @ (coeff.reshape(8, 8) * qtab) @ _T + 128.0

    for my in range(mcuy):
        for mx in range(mcux):
            for c in range(nc):
                _cid, hc, vc, _qid = comps[c]
                for byy in range(vc):
                    for bxx in range(hc):
                        y0 = (my * vc + byy) * 8
                        x0 = (mx * hc + bxx) * 8
                        planes[c][y0 : y0 + 8, x0 : x0 + 8] = read_block(c)
    # upsample subsampled planes to full resolution, crop padding
    full = np.empty((h, w, nc))
    for c in range(nc):
        _cid, hc, vc, _qid = comps[c]
        p = planes[c]
        if hc != hmax or vc != vmax:
            p = np.repeat(np.repeat(p, vmax // vc, axis=0), hmax // hc, axis=1)
        full[:, :, c] = p[:h, :w]
    if nc == 1:
        gray = np.clip(np.round(full[:, :, 0]), 0, 255).astype(np.uint8)
        return np.repeat(gray[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(full)
