"""FLAC (fixed-predictor subset) encode/decode in pure numpy.

The audio side of the live-codec family gains its entropy-coded
lossless format: FLAC frames with CONSTANT / VERBATIM / FIXED-predictor
subframes and Rice-coded residuals — the real container (fLaC magic,
STREAMINFO metadata block, frame sync + UTF-8 frame numbers, CRC-8
header and CRC-16 frame checksums) with the real bit layer (MSB-first
unary quotients, zigzag folding, 4-bit Rice parameters incl. the
escape-to-raw code). Like PNG/QOI/GIF/TIFF, FLAC is LOSSLESS:
decode(encode(x)) == x exactly, so the driver oracle
(mm_flac_decode_stats) recomputes sample statistics straight from the
generation rule without seeing a byte.

Subset: bit depths 8/16/24; 1-8 channels; fixed or variable blocking.
Round 13 widened the original
fixed-predictor subset with the two features real FLAC corpora are
overwhelmingly made of:

* LPC subframes — per-block autocorrelation + Levinson-Durbin,
  coefficients quantized to a (precision, shift) pair exactly as the
  wire carries them, residuals computed against the INTEGER prediction
  ``(sum(qcoef_j * s[i-1-j]) >> shift)`` so decode(encode(x)) == x
  regardless of how good the float model was;
* stereo decorrelation — all four channel assignments (independent,
  left/side, right/side, mid/side), the side channel carried at
  bits-per-sample + 1 per the spec, selected per frame by estimated
  cost (``channel_mode="auto"``) or cycled deterministically for
  coverage (``channel_mode="cycle"``).

Round 14 adds the residual layout real encoders emit by default:

* Rice partition orders > 0 — the residual splits into 2^po
  partitions, each with its OWN 4-bit Rice parameter (or per-partition
  raw escape); partition 0 carries ``(n >> po) - predictor_order``
  residuals, the rest ``n >> po``. The encoder searches the orders in
  ``partition_orders`` by exact bit count, so transient-heavy blocks
  (quiet runs punctuated by spikes) pay the loud partitions a big k
  and the quiet ones a small k instead of one compromise parameter;
* wasted bits — when every sample in a subframe's block shares w
  trailing zero bits (common for up-scaled or attenuated material),
  the subframe header carries w unary-coded and the whole subframe
  (warmup, prediction, residuals) runs at ``bps - w``; the decoder
  shifts the reconstruction left by w;
* bit depths 8, 12, 20, and 24 (sample-size codes 001/010/101/110,
  STREAMINFO bps, side channels at bps + 1 — the non-byte-aligned
  12/20 widths land every sample I/O on the bit-reader's unaligned
  path, round 15 per the r14 verdict) and 3-8 channel surround layouts
  (channel code nch - 1, independent subframes per the spec — stereo
  decorrelation is a 2-channel concept);
* variable blocking — blocking-strategy bit 1, frame headers carrying
  the starting SAMPLE number (UTF-8, through the 4-byte extension),
  per-frame block sizes; STREAMINFO min/max block sizes reflect it.

Still outside the subset: 32-bit depth and non-streamable oddities
(negative LPC shift, reserved codes), which decode rejects explicitly.

Reference scope parity: the reference stores opaque binary payloads;
decode here is a first-class distributed operator per SURVEY.md's
multimodal mandate.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_flac", "decode_flac", "decode_flac_stats",
           "decode_flac_stereo_stats", "decode_flac_multichannel_stats"]


# ---------------------------------------------------------------------------
# CRCs (FLAC: CRC-8 poly 0x07 over the frame header, CRC-16 poly 0x8005
# over the whole frame)
# ---------------------------------------------------------------------------

def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = np.zeros(256, dtype=np.int64)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tab[b] = r & mask
    return tab


_CRC8_TAB = _crc_table(0x07, 8)
_CRC16_TAB = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC8_TAB[(r ^ b) & 0xFF])
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = (int(_CRC16_TAB[((r >> 8) ^ b) & 0xFF]) ^ ((r << 8) & 0xFFFF)) & 0xFFFF
    return r


# ---------------------------------------------------------------------------
# MSB-first bit IO
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def unary(self, q: int) -> None:
        # FLAC unary: q zero bits terminated by a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, nbits: int) -> int:
        while self.nbits < nbits:
            if self.pos >= len(self.data):
                raise ValueError("bitstream underrun")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        v = (self.acc >> (self.nbits - nbits)) & ((1 << nbits) - 1)
        self.nbits -= nbits
        self.acc &= (1 << self.nbits) - 1
        return v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("runaway unary code")
        return q

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0

    def byte_pos(self) -> int:
        if self.nbits % 8:
            raise ValueError("not byte aligned")
        return self.pos - self.nbits // 8


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _utf8_number(n: int) -> bytes:
    """FLAC's extended UTF-8 coding of the frame/sample number (sample
    numbers appear under variable blocking, so 4-byte codes are real)."""
    if n < 0x80:
        return bytes([n])
    if n < 0x800:
        return bytes([0xC0 | (n >> 6), 0x80 | (n & 0x3F)])
    if n < 0x10000:
        return bytes([0xE0 | (n >> 12), 0x80 | ((n >> 6) & 0x3F), 0x80 | (n & 0x3F)])
    if n < 0x200000:
        return bytes([0xF0 | (n >> 18), 0x80 | ((n >> 12) & 0x3F),
                      0x80 | ((n >> 6) & 0x3F), 0x80 | (n & 0x3F)])
    raise ValueError("frame/sample number too large for this subset")


def _read_utf8_number(rdr: _BitReader) -> int:
    b0 = rdr.read(8)
    if b0 < 0x80:
        return b0
    if b0 >> 5 == 0b110:
        n, extra = b0 & 0x1F, 1
    elif b0 >> 4 == 0b1110:
        n, extra = b0 & 0x0F, 2
    elif b0 >> 3 == 0b11110:
        n, extra = b0 & 0x07, 3
    else:
        raise ValueError("bad UTF-8 frame number")
    for _ in range(extra):
        b = rdr.read(8)
        if b >> 6 != 0b10:
            raise ValueError("bad UTF-8 continuation")
        n = (n << 6) | (b & 0x3F)
    return n


def _zigzag(v: np.ndarray) -> np.ndarray:
    return np.where(v >= 0, 2 * v, -2 * v - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _best_rice_k(u: np.ndarray) -> int:
    """Smallest total-bits k in [0, 14] for zigzagged residuals."""
    if len(u) == 0:
        return 0
    best_k, best_bits = 0, None
    for k in range(15):
        bits = int(np.sum((u >> k) + 1 + k))
        if best_bits is None or bits < best_bits:
            best_k, best_bits = k, bits
    return best_k


def _partition_bounds(n: int, order: int, po: int):
    """Residual index ranges for partition order ``po``: partition 0
    holds (n >> po) - order residuals, partitions 1..2^po-1 hold
    n >> po each (residual index i corresponds to sample order + i)."""
    plen = n >> po
    bounds = []
    start = 0
    for p in range(1 << po):
        cnt = (plen - order) if p == 0 else plen
        bounds.append((start, start + cnt))
        start += cnt
    return bounds


def _best_partition(u: np.ndarray, n: int, order: int,
                    partition_orders: tuple):
    """Cheapest Rice partitioning of zigzagged residuals ``u`` among the
    candidate orders: exact bit count = 4 (po field) + per partition
    (4-bit parameter + unary quotients + k-bit remainders). A candidate
    is valid only when 2^po divides the block size and the first
    partition keeps at least one residual (n >> po > predictor order).
    Returns (bits, po, [k per partition]).

    Cost evaluation is the real-encoder bottom-up fold: the per-
    partition quotient sums are computed ONCE at the finest candidate
    order (np.add.reduceat over all 15 k values) and coarser orders
    merge adjacent pairs — partition boundaries at po are exactly
    merged pairs of those at po+1, including the order-shortened first
    partition."""
    valid = [po for po in sorted(set(partition_orders))
             if 0 <= po <= 15 and not (po and n % (1 << po))
             and (n >> po) > order]
    if not valid:  # order 0 is always expressible when n > order
        k = _best_rice_k(u)
        return 4 + 4 + int(np.sum((u >> k) + 1 + k)), 0, [k]
    pomax = valid[-1]
    bounds = _partition_bounds(n, order, pomax)
    starts = np.array([lo for lo, _ in bounds])
    cnts = np.array([hi - lo for lo, hi in bounds], dtype=np.int64)
    # qsum[k, p] = sum(u[p] >> k); payload cost = qsum + cnts*(1+k)
    qsum = np.empty((15, len(bounds)), dtype=np.int64)
    for k in range(15):
        qsum[k] = np.add.reduceat(u >> k, starts)
    best = None
    cur = pomax
    for po in reversed(valid):
        if po != cur:
            step = 1 << (cur - po)
            qsum = qsum.reshape(15, -1, step).sum(axis=2)
            cnts = cnts.reshape(-1, step).sum(axis=1)
            cur = po
        cost = qsum + cnts[None, :] * (1 + np.arange(15, dtype=np.int64))[:, None]
        ks = np.argmin(cost, axis=0)
        bits = 4 + int(cost[ks, np.arange(len(ks))].sum()) + 4 * len(ks)
        if best is None or bits <= best[0]:
            best = (bits, po, [int(k) for k in ks])
    return best


def _wasted_bits(block: np.ndarray, bps: int) -> int:
    """Trailing zero bits shared by EVERY sample of the block (the
    subframe-header wasted-bits count). All-zero blocks report 0 — they
    encode as CONSTANT anyway. x and -x share a lowest set bit, so the
    OR of absolute values carries the answer. Capped at bps - 1 so the
    effective sample width stays positive."""
    nz = np.abs(block[block != 0])
    if nz.size == 0:
        return 0
    v = int(np.bitwise_or.reduce(nz))
    w = (v & -v).bit_length() - 1
    return min(w, bps - 1)


# ---------------------------------------------------------------------------
# LPC model fitting (encoder side only — the wire carries the quantized
# integers, so decode needs none of this)
# ---------------------------------------------------------------------------

def _lpc_coeffs(block: np.ndarray, order: int):
    """Levinson-Durbin over the block autocorrelation. Returns float
    predictor coefficients a (prediction a[0]*s[i-1] + a[1]*s[i-2] + ...)
    or None when the recursion degenerates (zero energy, instability)."""
    x = block.astype(np.float64)
    n = x.size
    if n <= order:
        return None
    autoc = np.array([float(np.dot(x[: n - lag], x[lag:])) for lag in range(order + 1)])
    err = autoc[0]
    if err <= 0:
        return None
    a = np.zeros(order)
    for i in range(order):
        acc = autoc[i + 1] - sum(a[j] * autoc[i - j] for j in range(i))
        if err <= 0:
            return None
        k = acc / err
        prev = a[:i].copy()
        for j in range(i):
            a[j] = prev[j] - k * prev[i - 1 - j]
        a[i] = k
        err *= 1.0 - k * k
    if not np.all(np.isfinite(a)):
        return None
    return a


def _quantize_lpc(a: np.ndarray, precision: int = 12):
    """Quantize float coefficients to ``precision``-bit signed integers
    with a shared right-shift, the exact (precision, shift, coeffs)
    triple the LPC subframe header carries. Returns None when the model
    is all-zero after quantization."""
    cmax = float(np.max(np.abs(a)))
    if not np.isfinite(cmax) or cmax <= 0:
        return None
    import math

    shift = precision - 1 - (math.floor(math.log2(cmax)) + 1)
    shift = max(0, min(15, shift))
    lim = 1 << (precision - 1)
    qc = [int(np.clip(round(float(c) * (1 << shift)), -lim, lim - 1)) for c in a]
    if all(c == 0 for c in qc):
        return None
    return qc, shift, precision


def _lpc_predict(x: np.ndarray, qc: list, shift: int, order: int) -> np.ndarray:
    """Integer LPC prediction for positions order..n-1 (arithmetic
    right shift, matching the decoder bit-for-bit)."""
    n = x.size
    pred = np.zeros(n - order, dtype=np.int64)
    for j, c in enumerate(qc):
        pred += c * x[order - 1 - j : n - 1 - j]
    return pred >> shift


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def encode_flac(
    sample_rate: int,
    samples: np.ndarray,
    block_size: int = 256,
    force_escape: bool = False,
    lpc_orders: tuple = (),
    force_lpc: bool = False,
    channel_mode: str = "auto",
    partition_orders: tuple = (0,),
    detect_wasted: bool = False,
    bit_depth: int = 16,
    variable_blocking: bool = False,
) -> bytes:
    """Encode integer samples — mono (shape (n,)), stereo (shape
    (n, 2)), or 3-8 independent channels (shape (n, nch)) at
    ``bit_depth`` 8/12/16/20/24 (rounds 14-15 widening: every bit depth
    real FLAC corpora carry short of 32, and the surround layouts, which
    the spec codes as independent subframes with channel code nch-1).
    Each block becomes one frame; per subframe the cheapest of
    CONSTANT / FIXED 0-4 / LPC (orders in ``lpc_orders``) is chosen by
    exact Rice bit count, with a VERBATIM fallback when coding would
    expand. ``force_lpc`` restricts the predictor search to LPC (the
    fixture knob that guarantees the LPC wire path is on the stream,
    like ``force_escape`` for the raw-residual escape). For stereo,
    ``channel_mode`` picks the per-frame channel assignment: "auto"
    (cheapest of independent / left-side / right-side / mid-side) or
    "cycle" (frame_no mod 4 — deterministic coverage of all four).
    ``partition_orders`` lists the Rice partition orders the per-
    subframe search may pick (exact bit count decides; orders that
    don't divide the block or would starve partition 0 are skipped);
    ``detect_wasted`` moves shared trailing zero bits into the
    subframe header, the real-encoder default for up-scaled material.
    ``variable_blocking`` sets the frame header's blocking-strategy
    bit and cycles deterministic block sizes (block_size, 3/4, 1/2 of
    it); each header then carries the frame's starting SAMPLE number
    UTF-8-coded instead of the frame number, per the spec."""
    samples = np.asarray(samples, dtype=np.int64)
    if samples.size == 0:
        raise ValueError("empty input")
    if bit_depth not in (8, 12, 16, 20, 24):
        raise ValueError("bit_depth must be 8/12/16/20/24 in this subset")
    if samples.ndim == 2 and samples.shape[1] == 1:
        samples = samples[:, 0]          # (n, 1) is mono
    nch = 1 if samples.ndim == 1 else samples.shape[1]
    if samples.ndim > 2 or not (1 <= nch <= 8):
        raise ValueError("samples must be (n,) or (n, channels<=8)")
    if not (2 <= block_size <= 256):
        raise ValueError("block_size in [2, 256] for this subset")
    lim = 1 << (bit_depth - 1)
    if samples.max() >= lim or samples.min() < -lim:
        raise ValueError(f"samples exceed {bit_depth}-bit range")
    if channel_mode not in ("auto", "cycle"):
        raise ValueError("channel_mode is 'auto' or 'cycle'")

    n_total = samples.shape[0]
    out = bytearray(b"fLaC")
    # STREAMINFO: last-block flag + type 0, length 34
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)   # min/max block size
    si += b"\x00\x00\x00" * 2                           # min/max frame size unknown
    # 20 bits rate | 3 bits channels-1 | 5 bits bps-1 | 36 bits total
    packed = ((sample_rate << 44) | ((nch - 1) << 41)
              | ((bit_depth - 1) << 36) | int(n_total))
    si += packed.to_bytes(8, "big")
    si += b"\x00" * 16                                  # MD5 unknown
    out += bytes([0x80, 0, 0, 34]) + si

    if variable_blocking:
        sizes = (block_size, max(2, 3 * block_size // 4),
                 max(2, block_size // 2))
        # STREAMINFO min/max block size reflect the cycle
        struct.pack_into(">HH", out, 8, min(sizes), max(sizes))
        off = fi = 0
        while off < n_total:
            bs = sizes[fi % 3]
            block = samples[off : off + bs]
            out += _encode_frame(
                fi, block, nch, force_escape, lpc_orders, force_lpc,
                channel_mode, partition_orders, detect_wasted, bit_depth,
                sample_start=off,
            )
            off += block.shape[0]
            fi += 1
    else:
        for fi, off in enumerate(range(0, n_total, block_size)):
            block = samples[off : off + block_size]
            out += _encode_frame(
                fi, block, nch, force_escape, lpc_orders, force_lpc,
                channel_mode, partition_orders, detect_wasted, bit_depth,
            )
    return bytes(out)


def _plan_subframe(block: np.ndarray, bps: int, lpc_orders: tuple,
                   force_lpc: bool, partition_orders: tuple = (0,),
                   detect_wasted: bool = False):
    """Pick the cheapest subframe coding for one channel's block.
    Returns (bits, plan); plan is (wasted, inner) with inner one of
    ('const', v) / ('verbatim',) / ('fixed', order, resid, u, po, ks) /
    ('lpc', order, qcoefs, precision, shift, resid, u, po, ks). With
    ``detect_wasted``, shared trailing zero bits move into the header
    and every candidate is planned at bps - wasted; the Rice layout is
    the cheapest of ``partition_orders`` by exact bit count."""
    n = len(block)
    if np.all(block == block[0]):
        return bps, (0, ("const", int(block[0])))
    w = _wasted_bits(block, bps) if detect_wasted else 0
    work = block >> w if w else block
    ebps = bps - w
    best = None
    if not force_lpc:
        for order in range(5):
            if order >= n:
                break
            resid = _fixed_residual(work, order)
            u = _zigzag(resid)
            pbits, po, ks = _best_partition(u, n, order, partition_orders)
            bits = ebps * order + 2 + pbits
            if best is None or bits < best[0]:
                best = (bits, (w, ("fixed", order, resid, u, po, ks)))
    for order in lpc_orders:
        if order < 1 or order > 32 or order >= n:
            continue
        a = _lpc_coeffs(work, order)
        if a is None:
            continue
        q = _quantize_lpc(a)
        if q is None:
            continue
        qc, shift, prec = q
        x = work.astype(np.int64)
        resid = x[order:] - _lpc_predict(x, qc, shift, order)
        u = _zigzag(resid)
        pbits, po, ks = _best_partition(u, n, order, partition_orders)
        bits = ebps * order + 4 + 5 + prec * order + 2 + pbits
        if best is None or bits < best[0]:
            best = (bits, (w, ("lpc", order, qc, prec, shift, resid, u, po, ks)))
    if best is None or best[0] >= ebps * n:
        return ebps * n, (w, ("verbatim",))
    return best


def _write_subframe(wtr: _BitWriter, block: np.ndarray, bps: int, plan,
                    force_escape: bool) -> None:
    w, inner = plan
    kind = inner[0]
    ebps = bps - w
    mask = (1 << ebps) - 1
    work = block >> w if w else block

    def wasted_flag():
        if w:
            wtr.write(1, 1)
            wtr.unary(w - 1)      # k-1 unary coded per spec
        else:
            wtr.write(0, 1)

    wtr.write(0, 1)
    if kind == "const":
        wtr.write(0b000000, 6)
        wasted_flag()
        wtr.write(inner[1] & mask, ebps)
        return
    if kind == "verbatim":
        wtr.write(0b000001, 6)
        wasted_flag()
        for s in work:
            wtr.write(int(s) & mask, ebps)
        return
    if kind == "fixed":
        _, order, resid, u, po, ks = inner
        wtr.write(0b001000 | order, 6)
    else:  # lpc
        _, order, qc, prec, shift, resid, u, po, ks = inner
        wtr.write(0b100000 | (order - 1), 6)
    wasted_flag()
    for s in work[:order]:                    # warmup at bps - wasted
        wtr.write(int(s) & mask, ebps)
    if kind == "lpc":
        wtr.write(prec - 1, 4)
        wtr.write(shift, 5)
        for c in qc:
            wtr.write(c & ((1 << prec) - 1), prec)
    wtr.write(0, 2)                           # residual method: Rice 4-bit
    wtr.write(po, 4)                          # partition order
    n = len(work)
    for p, (lo, hi) in enumerate(_partition_bounds(n, order, po)):
        # the escape code exists for residuals whose unary quotients
        # would explode; 16-bit inputs never reach it organically, so
        # force_escape keeps the decode path honest in tests
        if force_escape:
            seg_r = resid[lo:hi]
            peak = int(np.max(np.abs(seg_r))) if len(seg_r) else 0
            raw_bits = int(max(2, peak.bit_length() + 1))
            wtr.write(0b1111, 4)
            wtr.write(raw_bits, 5)
            for v in seg_r:
                wtr.write(int(v) & ((1 << raw_bits) - 1), raw_bits)
        else:
            k = ks[p]
            wtr.write(k, 4)
            for q in u[lo:hi]:
                wtr.unary(int(q) >> k)
                if k:
                    wtr.write(int(q) & ((1 << k) - 1), k)


def _stereo_channels(block: np.ndarray, ch_code: int, bps: int = 16):
    """Channel pair + per-channel bps for one stereo assignment.
    Side channels carry bps + 1 (side = L - R spans one extra bit)."""
    left = block[:, 0]
    right = block[:, 1]
    if ch_code == 0b0001:   # independent
        return (left, right), (bps, bps)
    if ch_code == 0b1000:   # left/side
        return (left, left - right), (bps, bps + 1)
    if ch_code == 0b1001:   # right/side (side FIRST per spec)
        return (left - right, right), (bps + 1, bps)
    if ch_code == 0b1010:   # mid/side
        return ((left + right) >> 1, left - right), (bps, bps + 1)
    raise ValueError("bad stereo channel code")


_SS_CODE = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110}
_SS_BPS = {v: k for k, v in _SS_CODE.items()}


def _encode_frame(frame_no: int, block: np.ndarray, nch: int,
                  force_escape: bool, lpc_orders: tuple, force_lpc: bool,
                  channel_mode: str, partition_orders: tuple = (0,),
                  detect_wasted: bool = False, bit_depth: int = 16,
                  sample_start: int | None = None) -> bytes:
    n = block.shape[0]
    if nch == 2:
        if channel_mode == "cycle":
            ch_code = (0b0001, 0b1000, 0b1001, 0b1010)[frame_no % 4]
            chans, bpss = _stereo_channels(block, ch_code, bit_depth)
            plans = [
                _plan_subframe(c, b, lpc_orders, force_lpc,
                               partition_orders, detect_wasted)[1]
                for c, b in zip(chans, bpss)
            ]
        else:
            best = None
            for code in (0b0001, 0b1000, 0b1001, 0b1010):
                chans, bpss = _stereo_channels(block, code, bit_depth)
                planned = [
                    _plan_subframe(c, b, lpc_orders, force_lpc,
                                   partition_orders, detect_wasted)
                    for c, b in zip(chans, bpss)
                ]
                bits = sum(p[0] for p in planned)
                if best is None or bits < best[0]:
                    best = (bits, code, chans, bpss, [p[1] for p in planned])
            _, ch_code, chans, bpss, plans = best
    elif nch > 2:
        # 3-8 channels: independent coding only (stereo decorrelation
        # is a 2-channel concept); channel code = nch - 1 per spec
        ch_code = nch - 1
        chans = tuple(block[:, c] for c in range(nch))
        bpss = (bit_depth,) * nch
        plans = [
            _plan_subframe(c, bit_depth, lpc_orders, force_lpc,
                           partition_orders, detect_wasted)[1]
            for c in chans
        ]
    else:
        ch_code = 0b0000
        chans, bpss = (block,), (bit_depth,)
        plans = [_plan_subframe(block, bit_depth, lpc_orders, force_lpc,
                                partition_orders, detect_wasted)[1]]

    hdr = bytearray()
    # sync 11111111 111110, reserved 0, blocking strategy (1 = variable:
    # the UTF-8 field then carries the starting SAMPLE number)
    hdr += bytes([0xFF, 0xF9 if sample_start is not None else 0xF8])
    # block size code 0110 (8-bit value follows) | rate code 0000
    hdr += bytes([0x60])
    # channel code (4) | sample size (3) | reserved 0
    hdr += bytes([(ch_code << 4) | (_SS_CODE[bit_depth] << 1)])
    hdr += _utf8_number(frame_no if sample_start is None else sample_start)
    hdr += bytes([n - 1])
    hdr += bytes([crc8(bytes(hdr))])

    wtr = _BitWriter()
    for chan, bps, plan in zip(chans, bpss, plans):
        _write_subframe(wtr, chan, bps, plan, force_escape)
    wtr.align()
    frame = bytes(hdr) + bytes(wtr.out)
    return frame + struct.pack(">H", crc16(frame))


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _read_signed(rdr: _BitReader, nbits: int) -> int:
    v = rdr.read(nbits)
    return v - (1 << nbits) if v >= 1 << (nbits - 1) else v


def _decode_subframe(rdr: _BitReader, n: int, bps: int) -> list:
    """One subframe at the given bits-per-sample (17 for side channels).
    Handles wasted bits (the whole subframe runs at bps - w, the
    reconstruction shifts left by w) and any Rice partition order whose
    partition count divides the block size."""
    if rdr.read(1) != 0:
        raise ValueError("subframe padding bit set")
    stype = rdr.read(6)
    w = 0
    if rdr.read(1):                       # wasted-bits flag: k-1 unary
        w = rdr.unary() + 1
    ebps = bps - w
    if ebps < 1:
        raise ValueError("wasted bits exceed the sample width")
    if stype == 0b000000:  # CONSTANT
        return [_read_signed(rdr, ebps) << w] * n
    if stype == 0b000001:  # VERBATIM
        return [_read_signed(rdr, ebps) << w for _ in range(n)]
    if 0b001000 <= stype <= 0b001100:  # FIXED order 0-4
        order = stype & 0x7
        qc = None
        shift = 0
    elif stype & 0b100000:  # LPC, order 1-32
        order = (stype & 0x1F) + 1
    else:
        raise ValueError("reserved subframe type")
    warm = [_read_signed(rdr, ebps) for _ in range(order)]
    if stype & 0b100000:
        prec_code = rdr.read(4)
        if prec_code == 0b1111:
            raise ValueError("invalid LPC precision code")
        prec = prec_code + 1
        shift = rdr.read(5)
        if shift >= 1 << 4:  # 5-bit two's complement: negative shift
            raise ValueError("negative LPC shift outside the subset")
        qc = [_read_signed(rdr, prec) for _ in range(order)]
    if rdr.read(2) != 0:
        raise ValueError("only 4-bit Rice residuals in subset")
    po = rdr.read(4)
    if po and n % (1 << po):
        raise ValueError("partition count does not divide the block size")
    if (n >> po) <= order:
        raise ValueError("partition order starves the first partition")
    resid = []
    for p in range(1 << po):
        cnt = (n >> po) - order if p == 0 else n >> po
        k = rdr.read(4)
        if k == 0b1111:  # escape: raw two's-complement
            raw_bits = rdr.read(5)
            for _ in range(cnt):
                resid.append(_read_signed(rdr, raw_bits) if raw_bits else 0)
        else:
            for _ in range(cnt):
                q = rdr.unary()
                u = (q << k) | (rdr.read(k) if k else 0)
                resid.append(_unzigzag(u))
    block = list(warm)
    # Reconstruction bound: valid samples fit ebps <= 33 bits (side
    # channel at 32+1 before wasted-bit shift); corrupt coefficients or
    # residuals otherwise feed back EXPONENTIALLY through the predictor
    # (|pred| multiplies by up to order * 2^prec per step), overflowing
    # Python-int -> int64 conversion as OverflowError outside the stats
    # operators' catch set. 2^35 is a generous margin over any legal
    # sample; the frame CRC-16 only runs AFTER reconstruction, so this
    # must reject here.
    bound = 1 << 35
    if qc is None:
        coeffs = _FIXED_COEFFS[order]
        for r in resid:
            pred = sum(c * block[-i - 1] for i, c in enumerate(coeffs))
            nxt = pred + r
            if nxt > bound or nxt < -bound:
                raise ValueError("reconstructed sample outside any legal range")
            block.append(nxt)
    else:
        for r in resid:
            pred = sum(c * block[-i - 1] for i, c in enumerate(qc)) >> shift
            nxt = pred + r
            if nxt > bound or nxt < -bound:
                raise ValueError("reconstructed sample outside any legal range")
            block.append(nxt)
    if w:
        return [s << w for s in block]
    return block


def decode_flac(payload: bytes):
    """Decode the supported subset. Returns (sample_rate, samples):
    samples is shape (n,) for mono, (n, 2) for stereo (any mix of
    independent / left-side / right-side / mid-side frames), or
    (n, nch) for 3-8 independent channels; dtype int8 for depth 8,
    int16 for 12/16, int32 for 20/24. Raises ValueError on malformed input,
    bad CRCs, or features outside the subset."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    rate = None
    total = None
    channels = None
    # metadata blocks
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated metadata")
        hdr = payload[pos]
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        btype = hdr & 0x7F
        body = payload[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("metadata past end")
        if btype == 0:  # STREAMINFO
            if blen != 34:
                raise ValueError("bad STREAMINFO length")
            packed = int.from_bytes(body[10:18], "big")
            rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            if not (1 <= channels <= 8) or bps not in (8, 12, 16, 20, 24):
                raise ValueError("subset is 1-8 channels at 8/12/16/20/24 bit")
        pos += 4 + blen
        if hdr & 0x80:
            break
    if rate is None:
        raise ValueError("missing STREAMINFO")

    out: list = []
    n_out = 0
    expect_frame = 0
    while pos < len(payload) and n_out < total:
        frame_start = pos
        rdr = _BitReader(payload, pos)
        sync = rdr.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad frame sync at {pos}")
        if rdr.read(1) != 0:
            raise ValueError("reserved bit set")
        variable = rdr.read(1) == 1  # blocking strategy
        bs_code = rdr.read(4)
        sr_code = rdr.read(4)
        ch_code = rdr.read(4)
        ss_code = rdr.read(3)
        rdr.read(1)  # reserved
        if _SS_BPS.get(ss_code) != bps:
            raise ValueError("frame sample size disagrees with STREAMINFO")
        if channels == 1:
            if ch_code != 0b0000:
                raise ValueError("mono stream with non-mono frame")
        elif channels == 2:
            if ch_code not in (0b0001, 0b1000, 0b1001, 0b1010):
                raise ValueError("stereo frame channel code outside the subset")
        elif ch_code != channels - 1:
            raise ValueError("multichannel frame disagrees with STREAMINFO")
        coded_no = _read_utf8_number(rdr)
        # fixed blocking codes the FRAME number; variable blocking codes
        # the frame's starting SAMPLE number (spec): both must advance
        # exactly with what has been decoded so far
        if coded_no != (n_out if variable else expect_frame):
            raise ValueError("frame number out of sequence")
        if bs_code == 0b0110:
            n = rdr.read(8) + 1
        elif bs_code == 0b0111:
            n = rdr.read(16) + 1
        elif bs_code == 0b0001:
            n = 192
        elif 2 <= bs_code <= 5:
            n = 576 << (bs_code - 2)
        elif 8 <= bs_code <= 15:
            n = 256 << (bs_code - 8)
        else:
            raise ValueError("bad block size code")
        if sr_code != 0:
            raise ValueError("subset carries rate in STREAMINFO only")
        hdr_end = rdr.byte_pos()
        if crc8(payload[frame_start:hdr_end]) != rdr.read(8):
            raise ValueError("frame header CRC-8 mismatch")

        if channels == 1:
            block = _decode_subframe(rdr, n, bps)
        elif channels > 2:
            block = np.stack(
                [np.asarray(_decode_subframe(rdr, n, bps), dtype=np.int64)
                 for _ in range(channels)],
                axis=1,
            )
        else:
            # side channel (L-R) rides at bps+1 per the spec
            side_idx = {0b0001: None, 0b1000: 1, 0b1001: 0, 0b1010: 1}[ch_code]
            ch = [
                np.asarray(
                    _decode_subframe(rdr, n, (bps + 1) if side_idx == c else bps),
                    dtype=np.int64,
                )
                for c in range(2)
            ]
            if ch_code == 0b0001:
                left, right = ch
            elif ch_code == 0b1000:     # left/side
                left, right = ch[0], ch[0] - ch[1]
            elif ch_code == 0b1001:     # right/side (side first)
                left, right = ch[0] + ch[1], ch[1]
            else:                       # mid/side
                m2 = (ch[0] << 1) | (ch[1] & 1)
                left, right = (m2 + ch[1]) >> 1, (m2 - ch[1]) >> 1
            block = np.stack([left, right], axis=1)

        rdr.align()
        body_end = rdr.byte_pos()
        if body_end + 2 > len(payload):
            raise ValueError("truncated frame footer")
        (crc_got,) = struct.unpack_from(">H", payload, body_end)
        if crc16(payload[frame_start:body_end]) != crc_got:
            raise ValueError("frame CRC-16 mismatch")
        pos = body_end + 2
        if channels == 1:
            out.extend(block)
            n_out += len(block)
        else:
            out.append(block)
            n_out += block.shape[0]
        expect_frame += 1
    if n_out != total:
        raise ValueError(f"decoded {n_out} of {total} samples")
    dtype = {8: np.int8, 12: np.int16, 16: np.int16,
             20: np.int32, 24: np.int32}[bps]
    lim = 1 << (bps - 1)
    if channels == 1:
        full = np.asarray(out, dtype=np.int64)
    else:
        full = np.concatenate(out, axis=0)
    if full.size and (full.max() >= lim or full.min() < -lim):
        raise ValueError(f"reconstructed samples exceed {bps}-bit range")
    return int(rate), full.astype(dtype)


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

def decode_flac_stats(df, id_col: str, bin_col: str):
    """REAL FLAC decode emitting EXACT integer sample statistics (the
    codec family's shape): container walk, CRC-checked frames, Rice
    entropy decode, fixed-predictor reconstruction. Lossless, so a SQL
    oracle recomputes every BIGINT from the generation rule. Malformed
    payloads yield ok=false rows. One Arrow-batched mapInPandas pass;
    payloads never shuffle."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ok", T.BooleanType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("sample_sum", T.LongType()),
            T.StructField("abs_sum", T.LongType()),
            T.StructField("pos_weighted_sum", T.LongType()),
        ]
    )
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

    def decode(batches):
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "ok", "sample_rate", "n_samples",
                                   "sample_sum", "abs_sum", "pos_weighted_sum")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    rate, s = decode_flac(bytes(payload or b""))
                except (ValueError, IndexError, OverflowError, struct.error):
                    for key, v in (("ok", False), ("sample_rate", 0),
                                   ("n_samples", 0), ("sample_sum", 0),
                                   ("abs_sum", 0), ("pos_weighted_sum", 0)):
                        out[key].append(v)
                    continue
                s64 = s.astype(np.int64)
                p = np.arange(s64.size, dtype=np.int64)
                out["ok"].append(True)
                out["sample_rate"].append(int(rate))
                out["n_samples"].append(int(s64.size))
                out["sample_sum"].append(int(s64.sum()))
                out["abs_sum"].append(int(np.abs(s64).sum()))
                out["pos_weighted_sum"].append(int(((p % 997 + 1) * s64).sum()))
            yield pd.DataFrame(out)

    return src.mapInPandas(decode, schema=schema)


def decode_flac_stereo_stats(df, id_col: str, bin_col: str):
    """REAL stereo-LPC FLAC decode emitting EXACT per-channel integer
    statistics. Exercises the round-13 subset widening end-to-end:
    LPC subframes (quantized-coefficient integer prediction) and all
    four channel assignments (independent / left-side / right-side /
    mid-side reconstruction). Lossless, so a SQL oracle recomputes
    every BIGINT from the generation rule. Malformed or mono payloads
    yield ok=false rows. One Arrow-batched mapInPandas pass; payloads
    never shuffle."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cols = ("doc_id", "ok", "sample_rate", "n_samples",
            "left_sum", "right_sum", "left_abs_sum", "right_abs_sum",
            "left_pw_sum", "right_pw_sum")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ok", T.BooleanType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("left_sum", T.LongType()),
            T.StructField("right_sum", T.LongType()),
            T.StructField("left_abs_sum", T.LongType()),
            T.StructField("right_abs_sum", T.LongType()),
            T.StructField("left_pw_sum", T.LongType()),
            T.StructField("right_pw_sum", T.LongType()),
        ]
    )
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

    def decode(batches):
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    rate, s = decode_flac(bytes(payload or b""))
                    if s.ndim != 2 or s.shape[1] != 2:
                        raise ValueError("expected a stereo stream")
                except (ValueError, IndexError, OverflowError, struct.error):
                    out["ok"].append(False)
                    for key in cols[2:]:
                        out[key].append(0)
                    continue
                s64 = s.astype(np.int64)
                w = np.arange(s64.shape[0], dtype=np.int64) % 997 + 1
                out["ok"].append(True)
                out["sample_rate"].append(int(rate))
                out["n_samples"].append(int(s64.shape[0]))
                out["left_sum"].append(int(s64[:, 0].sum()))
                out["right_sum"].append(int(s64[:, 1].sum()))
                out["left_abs_sum"].append(int(np.abs(s64[:, 0]).sum()))
                out["right_abs_sum"].append(int(np.abs(s64[:, 1]).sum()))
                out["left_pw_sum"].append(int((w * s64[:, 0]).sum()))
                out["right_pw_sum"].append(int((w * s64[:, 1]).sum()))
            yield pd.DataFrame(out)

    return src.mapInPandas(decode, schema=schema)


def decode_flac_multichannel_stats(df, id_col: str, bin_col: str):
    """REAL multichannel / deep-bit-depth FLAC decode emitting EXACT
    integer statistics — the round-14 widening's driver gate: payloads
    carry 3-8 independent channels at 8/16/24 bit, and the checksum
    weights every sample by BOTH its channel index and its position, so
    a swapped channel, a dropped frame, or a bit-depth truncation lands
    as an integer mismatch. Lossless, so a SQL oracle recomputes every
    BIGINT from the generation rule. Malformed or mono/stereo payloads
    yield ok=false rows. One Arrow-batched mapInPandas pass; payloads
    never shuffle."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cols = ("doc_id", "ok", "sample_rate", "n_samples", "n_channels",
            "sample_sum", "abs_sum", "chpos_weighted_sum")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ok", T.BooleanType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("n_channels", T.IntegerType()),
            T.StructField("sample_sum", T.LongType()),
            T.StructField("abs_sum", T.LongType()),
            T.StructField("chpos_weighted_sum", T.LongType()),
        ]
    )
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

    def decode(batches):
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    rate, s = decode_flac(bytes(payload or b""))
                    if s.ndim != 2 or s.shape[1] < 3:
                        raise ValueError("expected a multichannel stream")
                except (ValueError, IndexError, OverflowError, struct.error):
                    out["ok"].append(False)
                    for key in cols[2:]:
                        out[key].append(0)
                    continue
                s64 = s.astype(np.int64)
                n, nch = s64.shape
                pw = (np.arange(n, dtype=np.int64) % 997 + 1)[:, None]
                cw = np.arange(1, nch + 1, dtype=np.int64)[None, :]
                out["ok"].append(True)
                out["sample_rate"].append(int(rate))
                out["n_samples"].append(int(n))
                out["n_channels"].append(int(nch))
                out["sample_sum"].append(int(s64.sum()))
                out["abs_sum"].append(int(np.abs(s64).sum()))
                out["chpos_weighted_sum"].append(int((pw * cw * s64).sum()))
            yield pd.DataFrame(out)

    return src.mapInPandas(decode, schema=schema)
