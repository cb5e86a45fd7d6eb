"""Stdlib-only FLAC codec (fixed + LPC predictors, stereo decorrelation).

Implements the published FLAC format (xiph.org spec; same subset every
open decoder handles first): STREAMINFO metadata, fixed-blocksize frames,
CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32 decode, Levinson-Durbin
order 2-8 encode) subframes with Rice-coded residuals, independent
channels AND the three stereo-decorrelation modes (left/side,
right/side, mid/side — channel assignments 8-10, side channel carried at
bps+1 bits), 16-bit samples.  The encoder picks the cheapest channel
assignment per frame and the cheapest predictor per subframe from
estimated Rice cost, exactly as reference encoders do; LPC residuals are
computed with exact integer arithmetic so the float fit never threatens
losslessness.  Wasted-bits subframes remain the one declared seam.

FLAC is lossless: the round-trip test asserts exact equality, unlike the
SNR gates of the lossy IMA-ADPCM/JPEG codecs.

Layout facts used below (spec section in parens):
- stream: "fLaC" magic + metadata blocks, then frames (§9).
- STREAMINFO: 16+16 min/max blocksize, 24+24 min/max framesize, 20-bit
  sample rate, 3-bit channels-1, 5-bit bps-1, 36-bit total samples,
  16-byte MD5 (§9.2).
- frame header: 14-bit sync 0b11111111111110, reserved bit, blocking
  strategy, 4-bit blocksize code, 4-bit samplerate code, 4-bit channel
  assignment, 3-bit sample size code, reserved bit, UTF-8-coded frame
  number, optional blocksize/samplerate fields, CRC-8 (§9.1).
- subframe: pad bit, 6-bit type (0 constant, 1 verbatim, 8+o fixed order
  o, 32+(o-1) LPC order o), wasted-bits unary flag (§9.2.1).
- LPC subframe: order warm-ups, 4-bit qlp precision - 1, 5-bit signed
  shift, order x precision signed coefficients; x[i] = r[i] +
  ((sum c_j x[i-1-j]) >> shift), arithmetic shift (§9.2.6).
- residual: 2-bit method (0: 4-bit Rice params), 4-bit partition order,
  per-partition Rice parameter (0b1111 escapes to raw) (§9.2.7).
- Rice: unary quotient, param-bit remainder, zigzag sign fold.
- fixed predictors: binomial-coefficient differencing, orders 0-4.
- frame footer: CRC-16 (poly 0x8005) over the whole frame.
"""

from __future__ import annotations

import struct

import numpy as np

_SYNC = 0b11111111111110

#: fixed-predictor coefficients per order: x̂[i] = Σ c_j · x[i-1-j]
_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self.out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, nbits: int) -> int:
        v = 0
        while nbits:
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(nbits, avail)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            nbits -= take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _utf8_coded(n: int) -> bytes:
    """FLAC's UTF-8-style frame-number coding (codepoint scheme applied
    to arbitrary 31-bit values)."""
    if n < 0x80:
        return bytes([n])
    for nbytes, lead in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8), (6, 0xFC)):
        if n < 1 << (5 * nbytes + 1):
            out = [lead | (n >> (6 * (nbytes - 1)))]
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


def _read_utf8_coded(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    for mask, lead, nb in (
        (0xE0, 0xC0, 2), (0xF0, 0xE0, 3), (0xF8, 0xF0, 4),
        (0xFC, 0xF8, 5), (0xFE, 0xFC, 6),
    ):
        if first & mask == lead:
            nbytes = nb
            n = first & (0xFF >> (nb + 1))
            break
    if not nbytes:
        raise ValueError("bad UTF-8-coded number")
    for _ in range(nbytes - 1):
        cont = br.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("bad UTF-8-coded continuation")
        n = (n << 6) | (cont & 0x3F)
    return n


def _fixed_residual(x: "np.ndarray", order: int) -> "np.ndarray":
    res = x.astype(np.int64)
    for _ in range(order):
        res = np.diff(res)
    return res


def _rice_cost(res: "np.ndarray", param: int) -> int:
    z = (res << 1) ^ (res >> 63)  # zigzag on int64
    return int(np.sum((z >> param) + 1 + param))


def _write_rice(bw: _BitWriter, res: "np.ndarray", param: int) -> None:
    for r in res:
        z = int((r << 1) ^ (r >> 63))
        bw.write_unary(z >> param)
        if param:
            bw.write(z & ((1 << param) - 1), param)


def _best_fixed(x: "np.ndarray") -> tuple[int, "np.ndarray"]:
    """Pick the fixed predictor order (0-4) with the smallest |residual|
    mass — the standard cheap order-selection heuristic."""
    best_order, best_res, best_cost = 0, x, None
    for order in range(0, min(5, len(x))):
        res = _fixed_residual(x, order)
        cost = int(np.abs(res).sum())
        if best_cost is None or cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    return best_order, best_res


def _best_rice_param(res: "np.ndarray") -> int:
    return min(range(15), key=lambda p: _rice_cost(res, p))


_MAX_LPC_ORDER = 8
_LPC_PRECISION = 15  # qlp coefficient bits (signed)


def _lpc_quantized(x: "np.ndarray", order: int):
    """Levinson-Durbin LPC fit + coefficient quantization, the standard
    FLAC encoder flow: autocorrelation -> reflection recursion (float)
    -> quantize to ``_LPC_PRECISION``-bit integers with a shift chosen so
    the largest coefficient uses the full precision.  Returns
    (qcoeffs int array, shift, residual int64 array) or None when the
    signal is degenerate (zero energy / unstable recursion) — the
    residual is computed with EXACT integer arithmetic, so whatever the
    float fit's quality, the codec stays lossless."""
    n = len(x)
    if n <= order:
        return None
    fx = x.astype(np.float64)
    ac = np.array(
        [np.dot(fx[: n - i], fx[i:]) for i in range(order + 1)]
    )
    if ac[0] == 0.0:
        return None
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - np.dot(a[:i], ac[i:0:-1][: i])
        if err == 0.0:
            return None
        k = acc / err
        a_new = a.copy()
        a_new[i] = k
        a_new[:i] = a[:i] - k * a[i - 1 :: -1][: i]
        a = a_new
        err *= 1.0 - k * k
    cmax = np.max(np.abs(a))
    if not np.isfinite(cmax) or cmax == 0.0:
        return None
    # shift: largest coefficient lands in [-2^(P-1), 2^(P-1)) after scaling
    shift = int(_LPC_PRECISION - 1 - np.floor(np.log2(cmax)) - 1)
    shift = max(0, min(15, shift))
    lim = 1 << (_LPC_PRECISION - 1)
    qc = np.clip(
        np.round(a * (1 << shift)).astype(np.int64), -lim, lim - 1
    )
    if not qc.any():
        return None
    pred = np.zeros(n - order, dtype=np.int64)
    for j in range(order):
        pred += qc[j] * x[order - 1 - j : n - 1 - j]
    res = x[order:] - (pred >> shift)
    return qc, shift, res


def _best_lpc(x: "np.ndarray"):
    """Cheapest quantized-LPC candidate (order 2/4/8), or None."""
    best = None
    for order in (2, 4, _MAX_LPC_ORDER):
        fit = _lpc_quantized(x, order)
        if fit is None:
            continue
        qc, shift, res = fit
        cost = _rice_cost(res, _best_rice_param(res))
        if best is None or cost < best[0]:
            best = (cost, qc, shift, res)
    return best


def _subframe_bits(x: "np.ndarray", sbits: int) -> int:
    """Estimated encoded size of one subframe, for assignment selection."""
    if len(x) and bool(np.all(x == x[0])):
        return 8 + sbits  # CONSTANT
    order, res = _best_fixed(x)
    bits = 14 + order * sbits + _rice_cost(res, _best_rice_param(res))
    lpc = _best_lpc(x)
    if lpc is not None:
        cost, qc, _, _ = lpc
        bits = min(
            bits,
            14 + 9 + len(qc) * (sbits + _LPC_PRECISION) + cost,
        )
    return bits


def _encode_subframe(
    bw: _BitWriter, x: "np.ndarray", sbits: int, use_lpc: bool = True
) -> None:
    """One subframe: CONSTANT when flat, else the cheaper of the best
    FIXED order and the best quantized-LPC fit, each with a single
    order-0 Rice partition.  ``sbits`` is the subframe sample size (bps,
    or bps+1 for a side channel)."""
    mask = (1 << sbits) - 1
    bw.write(0, 1)  # pad
    if len(x) and bool(np.all(x == x[0])):
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)  # no wasted bits
        bw.write(int(x[0]) & mask, sbits)
        return
    order, res = _best_fixed(x)
    fixed_cost = order * sbits + _rice_cost(res, _best_rice_param(res))
    lpc = _best_lpc(x) if use_lpc else None
    if lpc is not None:
        lcost, qc, shift, lres = lpc
        lpc_cost = 9 + len(qc) * (sbits + _LPC_PRECISION) + lcost
        if lpc_cost < fixed_cost:
            lorder = len(qc)
            bw.write(0b100000 | (lorder - 1), 6)  # LPC subframe
            bw.write(0, 1)  # no wasted bits
            for w in x[:lorder]:
                bw.write(int(w) & mask, sbits)  # warm-up
            bw.write(_LPC_PRECISION - 1, 4)
            bw.write(shift, 5)  # non-negative, two's complement field
            for c in qc:
                bw.write(int(c) & ((1 << _LPC_PRECISION) - 1), _LPC_PRECISION)
            bw.write(0, 2)  # residual method: 4-bit Rice
            bw.write(0, 4)  # partition order 0
            param = _best_rice_param(lres)
            bw.write(param, 4)
            _write_rice(bw, lres, param)
            return
    bw.write(8 + order, 6)  # FIXED subframe
    bw.write(0, 1)  # no wasted bits
    for w in x[:order]:
        bw.write(int(w) & mask, sbits)  # warm-up
    bw.write(0, 2)  # residual method: 4-bit Rice
    bw.write(0, 4)  # partition order 0
    param = _best_rice_param(res)
    bw.write(param, 4)
    _write_rice(bw, res, param)


def encode_flac(
    samples: "np.ndarray",
    sample_rate: int,
    block_size: int = 4096,
    stereo_mode: str = "auto",
    use_lpc: bool = True,
) -> bytes:
    """(n, channels) int16 -> FLAC bytes (fixed or Levinson-Durbin LPC
    predictors per subframe, Rice order-0 partitions; stereo frames pick
    the cheapest of independent / left-side / right-side / mid-side per
    frame).  ``stereo_mode``: 'auto' (per-frame assignment selection) or
    'independent'; ``use_lpc=False`` restricts to fixed predictors."""
    if stereo_mode not in ("auto", "independent"):
        raise ValueError(f"bad stereo_mode {stereo_mode!r}")
    samples = np.asarray(samples, dtype=np.int16)
    n, ch = samples.shape
    out = bytearray(b"fLaC")
    streaminfo = bytearray()
    streaminfo += struct.pack(">HH", block_size, block_size)
    streaminfo += b"\x00\x00\x00" * 2  # min/max framesize unknown
    # 20-bit rate | 3-bit ch-1 | 5-bit bps-1 | 36-bit total, packed big-endian
    packed = (sample_rate << 44) | ((ch - 1) << 41) | ((16 - 1) << 36) | n
    streaminfo += packed.to_bytes(8, "big")
    streaminfo += b"\x00" * 16  # md5 unset (spec-legal: all zero = skip)
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + bytes(streaminfo)

    for frame_idx, start in enumerate(range(0, n, block_size)):
        block = samples[start : start + block_size]
        bs = block.shape[0]
        # per-frame channel assignment: independent for mono/multichannel;
        # stereo additionally tries L/S (8), R/S (9), M/S (10) and keeps
        # the cheapest by estimated Rice cost (side channel costs bps+1)
        if ch == 2 and stereo_mode == "auto":
            left = block[:, 0].astype(np.int64)
            right = block[:, 1].astype(np.int64)
            side = left - right
            mid = (left + right) >> 1
            cands: list[tuple[int, list[tuple[np.ndarray, int]]]] = [
                (0b0001, [(left, 16), (right, 16)]),
                (0b1000, [(left, 16), (side, 17)]),
                (0b1001, [(side, 17), (right, 16)]),
                (0b1010, [(mid, 16), (side, 17)]),
            ]
            asgn, subframes = min(
                cands,
                key=lambda c: sum(_subframe_bits(x, sb) for x, sb in c[1]),
            )
        else:
            asgn = ch - 1
            subframes = [
                (block[:, c].astype(np.int64), 16) for c in range(ch)
            ]
        bw = _BitWriter()
        bw.write(_SYNC, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocksize stream
        bw.write(0b0111, 4)  # blocksize: 16-bit field at header end
        bw.write(0b0000, 4)  # samplerate: from STREAMINFO
        bw.write(asgn, 4)  # channel assignment
        bw.write(0b100, 3)  # 16 bps
        bw.write(0, 1)  # reserved
        for b in _utf8_coded(frame_idx):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        header = bytes(bw.out)
        if bw._nbits != 0:  # survives python -O, unlike assert
            raise RuntimeError(
                "FLAC frame header must be byte-aligned before CRC-8"
            )
        bw.write(_crc8(header), 8)
        for x, sbits in subframes:
            _encode_subframe(bw, x, sbits, use_lpc)
        bw.align()
        frame = bytes(bw.out)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def decode_flac(payload: bytes) -> tuple["np.ndarray", int]:
    """FLAC bytes -> (int16 [n, channels], sample_rate).  Fixed-predictor
    subset; LPC subframes / stereo decorrelation raise."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    rate = ch = bps = total = None
    while True:
        hdr = payload[pos]
        btype, last = hdr & 0x7F, hdr & 0x80
        ln = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + ln]
        if btype == 0:  # STREAMINFO
            packed = int.from_bytes(body[10:18], "big")
            rate = packed >> 44
            ch = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
        pos += 4 + ln
        if last:
            break
    if rate is None:
        raise ValueError("FLAC without STREAMINFO")
    if bps != 16:
        raise NotImplementedError(f"only 16-bit FLAC supported (got {bps})")
    chans: list[list[np.ndarray]] = [[] for _ in range(ch)]
    while pos < len(payload):
        br = _BitReader(payload, pos)
        if br.read(14) != _SYNC:
            raise ValueError(f"lost FLAC frame sync at byte {pos}")
        br.read(2)  # reserved + blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        chan_asgn = br.read(4)
        ss_code = br.read(3)
        br.read(1)
        if chan_asgn > 10:
            raise ValueError(f"reserved channel assignment {chan_asgn}")
        if ss_code not in (0, 0b100):
            raise NotImplementedError("non-16-bit frame sample size")
        _read_utf8_coded(br)
        if bs_code == 0b0110:
            bs = br.read(8) + 1
        elif bs_code == 0b0111:
            bs = br.read(16) + 1
        else:
            bs = {
                0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304,
                0b0101: 4608, 0b1000: 256, 0b1001: 512, 0b1010: 1024,
                0b1011: 2048, 0b1100: 4096, 0b1101: 8192, 0b1110: 16384,
                0b1111: 32768,
            }[bs_code]
        if sr_code == 0b1100:
            br.read(8)
        elif sr_code in (0b1101, 0b1110):
            br.read(16)
        br.read(8)  # CRC-8 (layout verified by round-trip tests)
        nch_frame = 2 if chan_asgn >= 8 else chan_asgn + 1
        frame_ch: list[np.ndarray] = []
        for c in range(nch_frame):
            # side channel (8: ch1, 9: ch0, 10: ch1) carries bps+1 bits
            sbits = 16 + (
                1
                if (chan_asgn, c) in ((8, 1), (9, 0), (10, 1))
                else 0
            )
            sign = 1 << (sbits - 1)
            wrap = 1 << sbits
            if br.read(1):
                raise ValueError("subframe pad bit set")
            stype = br.read(6)
            if br.read(1):  # wasted bits
                raise NotImplementedError("wasted-bits subframes")
            if stype == 0:  # CONSTANT
                v = br.read(sbits)
                v -= wrap if v & sign else 0
                frame_ch.append(np.full(bs, v, dtype=np.int64))
                continue
            if stype == 1:  # VERBATIM
                vals = np.empty(bs, dtype=np.int64)
                for i in range(bs):
                    v = br.read(sbits)
                    vals[i] = v - wrap if v & sign else v
                frame_ch.append(vals)
                continue
            if 8 <= stype <= 12:
                order = stype - 8
                is_lpc = False
            elif stype >= 32:
                order = (stype & 0x1F) + 1
                is_lpc = True
            else:
                raise ValueError(f"reserved subframe type {stype}")
            warm = []
            for _ in range(order):
                v = br.read(sbits)
                warm.append(v - wrap if v & sign else v)
            if is_lpc:
                prec = br.read(4) + 1
                if prec == 16:
                    raise ValueError("invalid qlp precision escape")
                shift = br.read(5)
                if shift & 0x10:
                    raise ValueError("negative qlp shift")
                csign = 1 << (prec - 1)
                qc = []
                for _ in range(order):
                    c = br.read(prec)
                    qc.append(c - (1 << prec) if c & csign else c)
            method = br.read(2)
            if method > 1:
                raise ValueError("bad residual method")
            pbits = 4 + method
            porder = br.read(4)
            nparts = 1 << porder
            res: list[int] = []
            for p in range(nparts):
                cnt = (bs >> porder) - (order if p == 0 else 0)
                param = br.read(pbits)
                if param == (1 << pbits) - 1:  # escape: raw signed bits
                    raw = br.read(5)
                    for _ in range(cnt):
                        v = br.read(raw) if raw else 0
                        if raw and v & (1 << (raw - 1)):
                            v -= 1 << raw
                        res.append(v)
                else:
                    for _ in range(cnt):
                        q = br.read_unary()
                        z = (q << param) | (br.read(param) if param else 0)
                        res.append((z >> 1) ^ -(z & 1))
            x = list(warm)
            if is_lpc:
                for r in res:
                    pred = sum(
                        qc[j] * x[len(x) - 1 - j] for j in range(order)
                    )
                    x.append((pred >> shift) + r)
            else:
                coeffs = _FIXED_COEFFS[order]
                for r in res:
                    pred = sum(
                        coeffs[j] * x[len(x) - 1 - j] for j in range(order)
                    )
                    x.append(pred + r)
            frame_ch.append(np.asarray(x, dtype=np.int64))
        # undo stereo decorrelation (spec: side = left - right,
        # mid = (left + right) >> 1 with the dropped low bit recoverable
        # from side's parity)
        if chan_asgn == 8:  # left/side
            left, side = frame_ch
            frame_ch = [left, left - side]
        elif chan_asgn == 9:  # right/side
            side, right = frame_ch
            frame_ch = [side + right, right]
        elif chan_asgn == 10:  # mid/side
            mid, side = frame_ch
            lr_sum = (mid << 1) | (side & 1)
            frame_ch = [(lr_sum + side) >> 1, (lr_sum - side) >> 1]
        for c, x in enumerate(frame_ch):
            chans[c].append(x.astype(np.int16))
        br.align()
        pos = br.byte + 2  # skip frame CRC-16
    out = np.stack([np.concatenate(cs) for cs in chans], axis=1)
    if total:
        out = out[:total]
    return out, rate
