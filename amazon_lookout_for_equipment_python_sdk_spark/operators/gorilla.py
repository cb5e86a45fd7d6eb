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

import os
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


def _gorilla_compress_py(timestamps: "list[int]", values: "list[float]") -> bytes:
    """Reference scalar encoder (the original per-point implementation).

    Kept as the executable spec: tests assert the vectorized
    :func:`gorilla_compress` emits byte-identical payloads.  Not used on
    the hot path."""
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


def _gorilla_decompress_py(payload: bytes) -> tuple["list[int]", "list[float]"]:
    """Reference scalar decoder — executable spec twin of
    :func:`_gorilla_compress_py`; not on the hot path."""
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


def _bit_length_u64(x):
    """Vectorized ``int.bit_length`` for a uint64 array.

    Split hi/lo 32-bit halves so every operand is exactly representable
    in float64, then read the binary exponent via ``frexp`` (exact for
    exact integers — no ``log2`` rounding hazard at 2^k boundaries)."""
    import numpy as np

    hi = (x >> np.uint64(32)).astype(np.float64)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.float64)
    _, e_hi = np.frexp(hi)
    _, e_lo = np.frexp(lo)
    return np.where(hi > 0, e_hi + 64 - 32, e_lo).astype(np.int64)


def gorilla_compress(timestamps, values) -> bytes:
    """(sorted int64 timestamps, float64 values) -> Gorilla block.

    Vectorized encoder, byte-identical to :func:`_gorilla_compress_py`
    (pinned by test_gorilla): delta-of-delta classes, XOR lead/trail
    widths, and merged tag+payload bit fields all compute as whole-series
    numpy expressions; the only per-point Python is the paper's
    sequential (lead, len) window-reuse decision — a few int compares —
    and the final bitstream assembles with one vectorized bit-expand +
    ``np.packbits``.  ~20x the scalar encoder on archive-sized series
    (this codec is the designated 100-TB archive path, so the per-point
    constant matters as much as the plan shape)."""
    import numpy as np

    ts = np.asarray(timestamps, dtype=np.int64)
    vs = np.asarray(values, dtype=np.float64)
    n = len(ts)
    if n != len(vs):
        raise ValueError("timestamps and values must align")
    if n == 0:
        return struct.pack("<I", 0)
    vb = vs.view(np.uint64)
    head = struct.pack("<IqQ", n, int(ts[0]), int(vb[0]))
    if n == 1:
        return head

    delta = ts[1:] - ts[:-1]
    dod = np.empty(n - 1, dtype=np.int64)
    dod[0] = delta[0]
    dod[1:] = delta[1:] - delta[:-1]
    x = vb[1:] ^ vb[:-1]

    # dod class selection (check order mirrors the scalar encoder: the
    # zero class wins before the [-64,63] class that contains it); tag
    # and payload merge into ONE fixed-width field per class — bitwise
    # identical to writing tag then payload.
    du = dod.astype(np.uint64)
    c0 = dod == 0
    c1 = (dod >= -64) & (dod <= 63)
    c2 = (dod >= -256) & (dod <= 255)
    c3 = (dod >= -2048) & (dod <= 2047)
    f1 = (np.uint64(0b10) << np.uint64(7)) | (du & np.uint64(0x7F))
    f2 = (np.uint64(0b110) << np.uint64(9)) | (du & np.uint64(0x1FF))
    f3 = (np.uint64(0b1110) << np.uint64(12)) | (du & np.uint64(0xFFF))
    dfield = np.select(
        [c0, c1, c2, c3],
        [np.zeros_like(du), f1, f2, f3],
        default=np.uint64(0b1111),
    )
    dcount = np.select([c0, c1, c2, c3], [1, 9, 12, 16], default=4)
    is_raw = dcount == 4

    lead = np.int64(64) - _bit_length_u64(x)
    lowbit = x & (~x + np.uint64(1))
    trail = _bit_length_u64(lowbit) - 1  # -1 when x==0 (unused)
    xnz = x != np.uint64(0)

    # the ONLY sequential part: the paper's (lead, len) window-reuse
    # chain over nonzero-XOR points — a few int compares per point; the
    # whole field stream assembles vectorized from its verdicts below
    nz = np.flatnonzero(xnz)
    new_flags: "list[bool]" = []
    r_shift: "list[int]" = []  # reuse-case shift (== window trail)
    r_len: "list[int]" = []  # reuse-case meaningful-bit count
    an = new_flags.append
    as_ = r_shift.append
    al = r_len.append
    prev_lead = -1
    prev_len = 0
    prev_trail = 0
    for li, ti in zip(lead[nz].tolist(), trail[nz].tolist()):
        if prev_lead >= 0 and li >= prev_lead and ti >= prev_trail:
            an(False)
            as_(prev_trail)
            al(prev_len)
        else:
            an(True)
            as_(0)
            al(0)
            prev_lead, prev_trail = li, ti
            prev_len = 64 - li - ti

    # per-point field counts -> scatter positions for the interleaved
    # (dod fields, value fields) stream
    dn = 1 + is_raw.astype(np.int64)
    vn = 1 + xnz.astype(np.int64)
    tot = dn + vn
    ends = np.cumsum(tot)
    nf = int(ends[-1])
    pos = ends - tot  # first field index of each point
    va = np.zeros(nf, dtype=np.uint64)
    ca = np.empty(nf, dtype=np.int64)
    va[pos] = dfield
    ca[pos] = dcount
    rp = pos[is_raw] + 1
    va[rp] = du[is_raw]
    ca[rp] = 64
    vp = pos + dn  # first VALUE field of each point
    zp = vp[~xnz]
    ca[zp] = 1  # va already 0
    vpn = vp[nz]
    xn = x[nz]
    newm = np.array(new_flags, dtype=bool)
    ruse = vpn[~newm]
    va[ruse] = np.uint64(0b10)
    ca[ruse] = 2
    sh_u = np.array(r_shift, dtype=np.uint64)[~newm]
    va[ruse + 1] = xn[~newm] >> sh_u
    ca[ruse + 1] = np.array(r_len, dtype=np.int64)[~newm]
    nw = vpn[newm]
    lead_n = lead[nz][newm].astype(np.uint64)
    trail_n = trail[nz][newm].astype(np.uint64)
    ln_n = np.uint64(64) - lead_n - trail_n
    va[nw] = (
        (np.uint64(0b11) << np.uint64(12))
        | (lead_n << np.uint64(6))
        | (ln_n & np.uint64(0x3F))  # 64 stored as 0
    )
    ca[nw] = 14
    va[nw + 1] = xn[newm] >> trail_n
    ca[nw + 1] = ln_n.astype(np.int64)

    return head + _pack_fields(va, ca).tobytes()


def _pack_fields(vals_out, cnts_out):
    """Variable-width MSB-first bit packing via word scatter-OR.

    Every field (value, width <= 64 bits) ORs directly into a uint64
    word array at its bit position: fields are laid out sequentially, so
    per WORD the co-resident fields form one contiguous run
    (``bitwise_or.reduceat`` over the sorted word index), and a field
    straddling a word boundary ORs its tail into the next word — tails
    target strictly increasing words (two fields cannot both start in
    one word and both cross out of it), so a plain indexed OR is safe.
    OR is order-free; output bytes match ``_BitWriter`` exactly
    (zero-padded final byte).

    This replaces the per-BIT expansion packer (8 scratch bytes per
    payload BIT — a 64x blowup): its ~85 MB of fresh per-call buffers
    were the encoder's dominant cost on hosts where first-touch page
    faults are expensive (r15 profile: 3.0 of 3.3 s in fill/take on the
    sf0.1 blocks).  This form touches O(payload) bytes: the word array
    plus a few per-FIELD vectors (~13x fewer elements than bits)."""
    import numpy as np

    va = np.asarray(vals_out, dtype=np.uint64)
    ca = np.asarray(cnts_out, dtype=np.int64)
    if not len(ca):
        return np.zeros(0, dtype=np.uint8)
    ends = np.cumsum(ca)
    total = int(ends[-1])
    starts = ends - ca
    n_words = (total + 63) >> 6
    words = np.zeros(n_words + 1, dtype=np.uint64)  # +1: boundary tails
    w = starts >> 6
    end_off = (starts & 63) + ca  # field end within its word, 1..127
    # head part: bits that land in word w.  All shift counts stay in
    # [0, 63]: end_off >= 1 always, and the split branch's right shift
    # is end_off - 64 <= 63 (width <= 64, offset <= 63).  Field values
    # are already width-masked by construction (the encoder builds each
    # field from masked payloads; test_gorilla pins byte-identity).
    split = end_off > 64
    hi = np.where(
        split,
        va >> np.where(split, end_off - 64, 0).astype(np.uint64),
        va << np.where(split, 0, 64 - end_off).astype(np.uint64),
    )
    uw, first = np.unique(w, return_index=True)  # w is nondecreasing
    words[uw] |= np.bitwise_or.reduceat(hi, first)
    if split.any():
        lo = va[split] << (np.uint64(128) - end_off[split].astype(np.uint64))
        words[w[split] + 1] |= lo
    return np.frombuffer(
        words[:n_words].astype(">u8").tobytes(), dtype=np.uint8
    )[: (total + 7) >> 3]


def gorilla_decompress(payload: bytes) -> tuple["list[int]", "list[float]"]:
    """Gorilla block -> (timestamps, values) lists, bit-exact round trip.
    List-returning wrapper over :func:`_gorilla_decompress_arrays`."""
    ts, vals = _gorilla_decompress_arrays(payload)
    return ts.tolist(), vals.tolist()


#: C twin of the per-point field walk in :func:`_gorilla_decompress_arrays`
#: — the one data-dependent sequential loop numpy cannot express (the r15
#: lockstep experiment measured WHY: one ufunc dispatch round per
#: point-step).  Same word-peek construction, same branch order, same
#: two's-complement wrap semantics (all arithmetic uint64, matching
#: numpy's wrapping int64 cumsum/xor reconstruction).  Corrupt streams
#: return nonzero instead of decoding garbage; the caller falls back to
#: the pure-Python walk, so behaviour on bad input is unchanged.
_GORILLA_C_SRC = r"""
#include <stdint.h>

static inline uint64_t peek(const uint8_t* q0, uint64_t pos) {
    const uint8_t* q = q0 + (pos >> 3);
    uint64_t w = ((uint64_t)q[0] << 56) | ((uint64_t)q[1] << 48)
               | ((uint64_t)q[2] << 40) | ((uint64_t)q[3] << 32)
               | ((uint64_t)q[4] << 24) | ((uint64_t)q[5] << 16)
               | ((uint64_t)q[6] << 8)  |  (uint64_t)q[7];
    unsigned r = (unsigned)(pos & 7u);
    if (r) w = (w << r) | ((uint64_t)q[8] >> (8u - r));
    return w;
}

/* buf: payload bytes AFTER the 20-byte header, zero-padded by >= 32
   bytes (nbytes counts only the real payload).  Returns 0 on success,
   nonzero when the stream would overrun or is structurally invalid. */
long long gorilla_decode(const uint8_t* buf, long long nbytes, long long n,
                         long long t0, uint64_t v0bits,
                         long long* ts_out, uint64_t* vb_out) {
    uint64_t pos = 0;
    uint64_t maxbit = (uint64_t)nbytes * 8u;
    uint64_t prev_t = (uint64_t)t0;
    uint64_t prev_delta = 0;
    uint64_t prev_bits = v0bits;
    unsigned prev_len = 0, prev_shift = 0;
    long long i;
    ts_out[0] = t0;
    vb_out[0] = (long long)v0bits;
    for (i = 1; i < n; i++) {
        uint64_t w, dod;
        if (pos >= maxbit) return 1;
        w = peek(buf, pos);
        if (!(w >> 63)) { dod = 0; pos += 1; }
        else {
            unsigned top = (unsigned)(w >> 60);
            if (top < 0xCu) {
                uint64_t v = (w >> 55) & 0x7Fu;
                dod = (v >= 64u) ? v - 128u : v;
                pos += 9;
            } else if (top < 0xEu) {
                uint64_t v = (w >> 52) & 0x1FFu;
                dod = (v >= 256u) ? v - 512u : v;
                pos += 12;
            } else if (top == 0xEu) {
                uint64_t v = (w >> 48) & 0xFFFu;
                dod = (v >= 2048u) ? v - 4096u : v;
                pos += 16;
            } else {
                pos += 4;
                if (pos >= maxbit) return 1;
                dod = peek(buf, pos);
                pos += 64;
            }
        }
        prev_delta += dod;
        prev_t += prev_delta;
        ts_out[i] = (long long)prev_t;
        if (pos >= maxbit) return 1;
        w = peek(buf, pos);
        if (!(w >> 63)) { pos += 1; }
        else if (!((w >> 62) & 1u)) {            /* '10': reuse window */
            if (prev_len == 0) return 2;         /* '10' before any '11' */
            pos += 2;
            w = peek(buf, pos);
            prev_bits ^= ((prev_len == 64u) ? w : (w >> (64u - prev_len)))
                         << prev_shift;
            pos += prev_len;
        } else {                                 /* '11': new window */
            unsigned lead = (unsigned)((w >> 56) & 0x3Fu);
            unsigned ln = (unsigned)((w >> 50) & 0x3Fu);
            if (!ln) ln = 64u;
            if (lead + ln > 64u) return 2;
            prev_len = ln;
            prev_shift = 64u - lead - ln;
            pos += 14;
            w = peek(buf, pos);
            prev_bits ^= ((ln == 64u) ? w : (w >> (64u - ln))) << prev_shift;
            pos += ln;
        }
        vb_out[i] = (long long)prev_bits;
    }
    return (pos <= maxbit) ? 0 : 1;
}
"""


def _native_gorilla():
    """Compiled :data:`_GORILLA_C_SRC` decoder, or ``None`` (fall back to
    the pure-Python walk).

    Build-and-load is guarded end to end: any failure (no compiler, no
    writable tempdir, load error, self-check mismatch) caches ``None``
    and the decoder stays pure Python — the kernel is an accelerator,
    never a requirement.  ``SPARKGRAFT_GORILLA_NATIVE=0`` disables it
    outright (checked per call, so tests can pin both paths).  The
    loaded handle lives in a synthetic ``sys.modules`` entry rather than
    a module global: this module is registered for by-VALUE cloudpickle
    (see the module tail), and a ctypes handle in a referenced global
    would break task serialization — worker processes re-open (or
    re-build) the cached .so themselves on first use."""
    import sys as _sys

    if os.environ.get("SPARKGRAFT_GORILLA_NATIVE", "").strip().lower() in (
        "0",
        "false",
        "no",
        "off",
    ):
        return None
    holder = _sys.modules.get("_sparkgraft_gorilla_native_state")
    if holder is not None:
        return holder.fn
    import types

    holder = types.ModuleType("_sparkgraft_gorilla_native_state")
    holder.fn = None
    _sys.modules["_sparkgraft_gorilla_native_state"] = holder
    try:
        holder.fn = _build_native_gorilla()
    except Exception:  # noqa: BLE001 - accelerator only, never required
        holder.fn = None
    return holder.fn


def _build_native_gorilla():
    """Compile (once per source hash, cached in tempdir) and load the C
    decoder; returns the ctypes fn after a round-trip self-check."""
    import ctypes
    import hashlib
    import subprocess
    import tempfile

    import numpy as np

    digest = hashlib.md5(_GORILLA_C_SRC.encode()).hexdigest()[:12]
    so = os.path.join(tempfile.gettempdir(), f"sparkgraft_gorilla_{digest}.so")
    if not os.path.exists(so):
        with tempfile.TemporaryDirectory() as d:
            src = os.path.join(d, "gorilla_decode.c")
            with open(src, "w") as fh:
                fh.write(_GORILLA_C_SRC)
            tmp = f"{so}.tmp.{os.getpid()}"
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", tmp, src],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(tmp, so)  # atomic: concurrent workers race safely
    lib = ctypes.CDLL(so)
    fn = lib.gorilla_decode
    fn.restype = ctypes.c_longlong
    fn.argtypes = [
        ctypes.c_void_p,
        ctypes.c_longlong,
        ctypes.c_longlong,
        ctypes.c_longlong,
        ctypes.c_uint64,
        ctypes.c_void_p,
        ctypes.c_void_p,
    ]

    def call(payload: bytes, n: int, t0: int, v0_bits: int):
        buf = np.frombuffer(payload[20:] + b"\x00" * 32, dtype=np.uint8)
        ts_out = np.empty(n, dtype=np.int64)
        vb_out = np.empty(n, dtype=np.uint64)
        rc = fn(
            buf.ctypes.data,
            len(payload) - 20,
            n,
            t0,
            v0_bits,
            ts_out.ctypes.data,
            vb_out.ctypes.data,
        )
        if rc != 0:
            return None
        return ts_out, vb_out.view(np.float64)

    # self-check once per process: a stale or foreign .so at the cache
    # path must not be able to poison results — exercise every branch
    # class (dod classes incl. raw, xor zero/new/reuse) and require an
    # exact match against the scalar spec before trusting the kernel.
    probe_ts = [0, 10, 20, 31, 300, 5000, 1 << 40]
    probe_vs = [1.5, 1.5, 2.75, -3.0, 2.75, 0.0, 1e300]
    probe = _gorilla_compress_py(probe_ts, probe_vs)
    got = call(probe, len(probe_ts), probe_ts[0], struct.unpack("<Q", struct.pack("<d", probe_vs[0]))[0])
    want_ts, want_vs = _gorilla_decompress_py(probe)
    if (
        got is None
        or got[0].tolist() != want_ts
        or got[1].tolist() != want_vs
    ):
        raise RuntimeError("native gorilla self-check failed")
    return call


def _gorilla_decompress_arrays(payload: bytes):
    """Gorilla block -> (int64 timestamps, float64 values) numpy arrays.

    Vectorized decoder (byte-level twin of :func:`_gorilla_decompress_py`,
    equivalence pinned by test_gorilla): the payload expands once into an
    array of 64-bit big-endian words at EVERY byte offset (8 vectorized
    shift-ors), so any <=64-bit field at bit position p reads as two list
    lookups and a shift — no per-bit loop.  The per-point walk extracts
    only the raw (dod, xor) streams; timestamp double-prefix-sum and the
    XOR value chain reconstruct vectorized afterwards
    (``np.bitwise_xor.accumulate``)."""
    import numpy as np

    (n,) = struct.unpack_from("<I", payload, 0)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    (t0,) = struct.unpack_from("<q", payload, 4)
    (v0_bits,) = struct.unpack_from("<Q", payload, 12)
    if n == 1:
        return (
            np.asarray([t0], np.int64),
            np.asarray([v0_bits], np.uint64).view(np.float64),
        )

    # native fast path (guarded; see _native_gorilla): the per-point
    # field walk in C, ts/value reconstruction included — byte-identical
    # output (branch-for-branch twin, fuzz-pinned in test_gorilla).  Any
    # failure, including a nonzero return on a corrupt stream, falls
    # through to the pure-Python walk below.
    native = _native_gorilla()
    if native is not None:
        out = native(payload, n, t0, v0_bits)
        if out is not None:
            return out

    buf = payload[20:] + b"\x00" * 16
    a8 = np.frombuffer(buf, dtype=np.uint8).astype(np.uint64)
    nq = len(buf) - 7
    q = np.zeros(nq, dtype=np.uint64)
    for k in range(8):
        q |= a8[k : k + nq] << np.uint64(8 * (7 - k))
    qw = q.tolist()  # qw[b] = bits of bytes b..b+7, MSB-first
    bl = list(buf)
    m64 = (1 << 64) - 1

    pos = 0
    dods: "list[int]" = []
    xs: "list[int]" = []
    ad = dods.append
    ax = xs.append
    prev_len = 0
    prev_shift = 0
    for _ in range(n - 1):
        b = pos >> 3
        r = pos & 7
        w = qw[b] if r == 0 else ((qw[b] << r) & m64) | (bl[b + 8] >> (8 - r))
        if w < 0x8000000000000000:  # '0': dod == 0
            ad(0)
            pos += 1
        else:
            top = w >> 60
            if top < 0b1100:  # '10' + 7
                v = (w >> 55) & 0x7F
                ad(v - 128 if v >= 64 else v)
                pos += 9
            elif top < 0b1110:  # '110' + 9
                v = (w >> 52) & 0x1FF
                ad(v - 512 if v >= 256 else v)
                pos += 12
            elif top == 0b1110:  # '1110' + 12
                v = (w >> 48) & 0xFFF
                ad(v - 4096 if v >= 2048 else v)
                pos += 16
            else:  # '1111' + raw 64
                pos += 4
                b = pos >> 3
                r = pos & 7
                v = (
                    qw[b]
                    if r == 0
                    else ((qw[b] << r) & m64) | (bl[b + 8] >> (8 - r))
                )
                ad(v - (1 << 64) if v >= (1 << 63) else v)
                pos += 64
        b = pos >> 3
        r = pos & 7
        w = qw[b] if r == 0 else ((qw[b] << r) & m64) | (bl[b + 8] >> (8 - r))
        if w < 0x8000000000000000:  # '0': value repeats
            ax(0)
            pos += 1
        elif w < 0xC000000000000000:  # '10': reuse (lead, len) window
            pos += 2
            b = pos >> 3
            r = pos & 7
            w = qw[b] if r == 0 else ((qw[b] << r) & m64) | (bl[b + 8] >> (8 - r))
            ax((w >> (64 - prev_len)) << prev_shift)
            pos += prev_len
        else:  # '11': new 6-bit lead + 6-bit len window
            lead = (w >> 56) & 0x3F
            prev_len = ((w >> 50) & 0x3F) or 64
            prev_shift = 64 - lead - prev_len
            pos += 14
            b = pos >> 3
            r = pos & 7
            w = qw[b] if r == 0 else ((qw[b] << r) & m64) | (bl[b + 8] >> (8 - r))
            ax((w >> (64 - prev_len)) << prev_shift)
            pos += prev_len

    # double prefix-sum, vectorized: delta = cumsum(dod), ts = t0 +
    # cumsum(delta) — exact int64 integer sums, identical to the scalar
    # running-total loop (timestamps are micros; a series whose true
    # deltas sum past int64 could not have been encoded in the first
    # place)
    darr = np.cumsum(np.asarray(dods, dtype=np.int64))
    np.cumsum(darr, out=darr)
    ts_out = np.empty(n, dtype=np.int64)
    ts_out[0] = t0
    np.add(darr, t0, out=ts_out[1:])
    arr = np.empty(n, dtype=np.uint64)
    arr[0] = v0_bits
    arr[1:] = xs
    np.bitwise_xor.accumulate(arr, out=arr)
    return ts_out, arr.view(np.float64)


def gorilla_decompress_blocks(payloads):
    """Decode MANY Gorilla blocks -> ``(n_points, timestamps, values)``
    as CONCATENATED streams (int64, int64, float64 numpy arrays, blocks
    in input order) — element-identical to running
    :func:`gorilla_decompress` per block, but the per-block arrays stay
    numpy end to end (no Python-list detour), so a consumer building an
    Arrow/pandas batch pays no per-element object conversion.

    Each block still decodes with the scalar word-level walk.  A full
    numpy LOCKSTEP across blocks (one vector step decodes point ``i`` of
    every block) was built and measured in r15 and REJECTED: the decode
    chain forces one numpy dispatch round per POINT-STEP (~100 us fixed,
    ~35 ufunc calls), so at 7200-pt blocks it only reached parity around
    1024 compressible blocks per batch and lost at every width on
    incompressible values (scalar walk: 0.7-2.7 us/point; see
    OPTIMIZATION_r15.md).  Across-task parallelism, not within-task
    vectorization, is this codec's scale axis."""
    import numpy as np

    ns = np.zeros(len(payloads), dtype=np.int64)
    ts_parts, val_parts = [], []
    for i, p in enumerate(payloads):
        t, v = _gorilla_decompress_arrays(bytes(p))
        ns[i] = len(t)
        ts_parts.append(t)
        val_parts.append(v)
    if not ts_parts:
        return ns, np.zeros(0, np.int64), np.zeros(0, np.float64)
    return ns, np.concatenate(ts_parts), np.concatenate(val_parts)


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
            pdf["_us"].to_numpy(), pdf[value_col].to_numpy()
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
    (key, ts, value), ``mapInPandas`` row-local.  Blocks decode through
    :func:`gorilla_decompress_blocks`, so the point streams stay numpy
    arrays end to end — no per-element Python-list detour into the
    Arrow batch."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    def unpack(batches):
        for pdf in batches:
            ns, tss, vs = gorilla_decompress_blocks(
                [bytes(p) for p in pdf["payload"]]
            )
            yield pd.DataFrame(
                {
                    key_col: np.repeat(pdf[key_col].to_numpy(), ns),
                    "_us": tss,
                    "value": vs,
                }
            )

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
