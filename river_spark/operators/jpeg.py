"""Baseline JPEG (ITU-T T.81) encode/decode in pure numpy + struct.

The round-11 codec family (BMP/WAV/PNG/QOI/GIF, operators/multimodal.py)
proved the pattern: implement the real container + entropy layer with no
external libraries, and pin every lossy stage to EXACT integer
arithmetic so a closed-form oracle can recompute the decoder's output
without seeing the bytes. JPEG is the remaining dominant real-corpus
image format; this module closes it for baseline sequential DCT:

- full marker stream: SOI / DQT / SOF0 / DHT / DRI / SOS / RSTn / EOI,
  APPn + COM skipped on decode;
- the standard Annex K Huffman tables (Tables K.3-K.6), emitted in DHT
  and REBUILT FROM THE SEGMENT on decode (a foreign baseline file with
  its own tables decodes too);
- entropy layer: DC prediction per component, (run, size) AC coding
  with EOB/ZRL, byte stuffing (0xFF -> 0xFF 0x00), restart-marker
  predictor resets;
- the DCT is a PINNED fixed-point kernel: T = round(C * 2^15) with C
  the orthonormal 8x8 DCT-II matrix, one int64 matrix sandwich and ONE
  final rounding shift per direction:
      forward  F = (T f T') >> 30   (round-half-up via +2^29)
      inverse  p = (T' F T) >> 30   (same rounding) + 128, clamped
  Quantization is round-half-up integer division. Every stage is an
  exact integer function of the input, so mm_jpeg_decode_stats'
  DuckDB oracle mirrors the arithmetic literally (no float anywhere).

Reference scope parity: the reference engine stores opaque binary
payloads and leaves decode to the application (docs/examples treat
payloads as bytes); this engine makes decode a first-class distributed
operator, per SURVEY.md's multimodal mandate.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_jpeg",
    "encode_jpeg_progressive",
    "decode_jpeg",
    "ycbcr_to_rgb_int",
    "QUANT_FLAT16",
    "QUANT_FLAT17",
]

# ---------------------------------------------------------------------------
# constant tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal DCT-II matrix, fixed-point 2^15 (see module docstring)
_C = np.zeros((8, 8))
_C[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
for _i in range(1, 8):
    for _j in range(8):
        _C[_i, _j] = 0.5 * np.cos((2 * _j + 1) * _i * np.pi / 16.0)
DCT_T = np.round(_C * (1 << 15)).astype(np.int64)

# flat quantization tables used by the oracle fixture: every coefficient
# shares one step, so a constant block's reconstruction is a two-term
# closed form. Any 64-entry table works for the codec itself.
QUANT_FLAT16 = np.full(64, 16, dtype=np.int64)
QUANT_FLAT17 = np.full(64, 17, dtype=np.int64)

# ITU-T T.81 Annex K: BITS (# codes per length 1..16) and HUFFVAL lists
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


# ---------------------------------------------------------------------------
# fixed-point DCT kernels
# ---------------------------------------------------------------------------

def fdct8x8_int(block: np.ndarray) -> np.ndarray:
    """Forward fixed-point DCT of one level-shifted int block (values in
    [-128, 127]): one int64 sandwich, one rounding shift."""
    g = DCT_T @ block.astype(np.int64) @ DCT_T.T
    return (g + (1 << 29)) >> 30


def idct8x8_int(coef: np.ndarray) -> np.ndarray:
    """Inverse of :func:`fdct8x8_int` on dequantized coefficients;
    returns clamped uint8 pixels (level shift +128 applied)."""
    p = DCT_T.T @ coef.astype(np.int64) @ DCT_T
    p = ((p + (1 << 29)) >> 30) + 128
    return np.clip(p, 0, 255).astype(np.uint8)


def _quantize(coef: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Round-half-up integer quantization: floor((2F + q) / 2q)."""
    c = coef.reshape(64)
    return np.floor_divide(2 * c + q, 2 * q)


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------

def _canonical_codes(bits, vals):
    """symbol -> (code, length) per the canonical T.81 construction."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_map(bits, vals):
    """(length, code) -> symbol for bit-serial decoding."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """T.81 DC/AC amplitude coding: (size, raw bits). Negative values
    are stored as value - 1 in `size` bits (one's-complement style)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """Inverse of :func:`_magnitude`."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        """Pad the tail with 1-bits to a byte boundary (T.81 F.1.2.3)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:  # stuffed byte
                self.pos += 2
            else:  # a real marker: the scan data has ended
                raise _MarkerReached(b, nxt)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_and_expect_rst(self, n: int) -> None:
        """Discard pad bits and consume the RSTn marker."""
        self.acc = 0
        self.nbits = 0
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + (n & 7):
            raise ValueError(
                f"expected RST{n & 7} at {self.pos}, got "
                f"{self.data[self.pos]:02x}{self.data[self.pos + 1]:02x}"
            )
        self.pos += 2


def _table(tabs: dict, key, what: str):
    """Dict lookup that reads as malformed-payload on a missing id (a
    corrupted scan can reference tables never defined; KeyError would
    escape the stats operators' catch set)."""
    try:
        return tabs[key]
    except KeyError as exc:
        raise ValueError(f"scan references undefined {what} {key}") from exc


class _MarkerReached(ValueError):
    # ValueError subclass: when entropy data runs into a marker that the
    # progressive scan loop does NOT expect (corrupt stream), the escape
    # must read as malformed-payload to the Arrow stats operators, not
    # crash the executor with an internal control-flow exception
    def __init__(self, hi, lo):
        self.marker = lo
        super().__init__(f"marker ff{lo:02x}")


def _decode_symbol(reader: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _encode_block(wtr, block, qtab, dc_tab, ac_tab, pred):
    """Entropy-encode one level-shifted 8x8 block; returns the new DC
    predictor (the quantized DC)."""
    coef = fdct8x8_int(block)
    zz = _quantize(coef, qtab)[ZIGZAG]
    diff = int(zz[0]) - pred
    size, bits = _magnitude(diff)
    code, length = dc_tab[size]
    wtr.write(code, length)
    if size:
        wtr.write(bits, size)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            wtr.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_tab[(run << 4) | size]
        wtr.write(code, length)
        wtr.write(bits, size)
        run = 0
    if last < 63:
        code, length = ac_tab[0x00]  # EOB
        wtr.write(code, length)
    return int(zz[0])


def _encode_jpeg_any(planes, samps, quant_luma, quant_chroma, restart_interval):
    """Shared marker + interleaved-MCU encoder: ``samps`` is one
    (h_i, v_i) sampling pair per plane; each plane's dimensions must be
    h*v_i/v_max x w*h_i/h_max with whole MCUs (no edge fill)."""
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    ph, pw = planes[0].shape
    # frame dimensions derive from plane 0 (always full-resolution)
    h = ph * vmax // samps[0][1]
    w = pw * hmax // samps[0][0]
    if h % (8 * vmax) or w % (8 * hmax):
        raise ValueError("dimensions must cover whole MCUs (no edge fill)")
    for p, (hs, vs) in zip(planes, samps):
        if p.shape != (h * vs // vmax, w * hs // hmax):
            raise ValueError("plane shape inconsistent with sampling factors")

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    # DQT: table 0 (luma) and, for color, table 1 (chroma); natural
    # order on the wire is zigzag order of the natural-order array
    qtabs = [np.asarray(quant_luma, dtype=np.int64)]
    if len(planes) == 3:
        qtabs.append(np.asarray(quant_chroma, dtype=np.int64))
    for tid, qt in enumerate(qtabs):
        if int(qt.max()) > 255:  # Pq=1: 16-bit big-endian entries
            seg(0xDB, bytes([0x10 | tid])
                + b"".join(struct.pack(">H", int(qt[ZIGZAG[k]]))
                           for k in range(64)))
        else:
            seg(0xDB, bytes([tid]) + bytes(int(qt[ZIGZAG[k]]) for k in range(64)))

    # SOF0: baseline, 8-bit, per-component sampling factors
    body = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci, (hs, vs) in enumerate(samps):
        body += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    seg(0xC0, body)

    # DHT: the standard Annex K tables
    huffs = [(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS), (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS)]
    if len(planes) == 3:
        huffs += [
            (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in huffs:
        seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))

    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))

    # SOS
    body = bytes([len(planes)])
    for ci in range(len(planes)):
        body += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    body += bytes([0, 63, 0])
    seg(0xDA, body)

    dc_enc = [_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)]
    ac_enc = [_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)]
    if len(planes) == 3:
        dc_enc.append(_canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
        ac_enc.append(_canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS))

    wtr = _BitWriter()
    pred = [0] * len(planes)
    mcus_x = w // (8 * hmax)
    mcus_y = h // (8 * vmax)
    rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            wtr.flush()
            wtr.out.extend(bytes([0xFF, 0xD0 + (rst & 7)]))
            rst += 1
            pred = [0] * len(planes)
        my, mx = divmod(m, mcus_x)
        for ci, (plane, (hs, vs)) in enumerate(zip(planes, samps)):
            tsel = 0 if ci == 0 else 1
            for by in range(vs):
                for bx in range(hs):
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    block = plane[y0 : y0 + 8, x0 : x0 + 8].astype(np.int64) - 128
                    pred[ci] = _encode_block(
                        wtr, block, qtabs[tsel], dc_enc[tsel], ac_enc[tsel], pred[ci]
                    )
    wtr.flush()
    out.extend(wtr.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


def encode_jpeg(
    planes: list[np.ndarray],
    quant_luma: np.ndarray = QUANT_FLAT16,
    quant_chroma: np.ndarray = QUANT_FLAT17,
    restart_interval: int = 0,
) -> bytes:
    """Encode 1 (grayscale) or 3 (YCbCr, 4:4:4) uint8 planes as a
    baseline sequential JPEG. Dimensions must be multiples of 8 (the
    oracle fixture generates whole blocks; general edge replication is
    the caller's concern). quant tables are 64-entry natural-order."""
    if len(planes) not in (1, 3):
        raise ValueError("1 or 3 planes")
    h, w = planes[0].shape
    if h % 8 or w % 8:
        raise ValueError("dimensions must be multiples of 8")
    for p in planes:
        if p.shape != (h, w):
            raise ValueError("all planes must share dimensions")
    return _encode_jpeg_any(
        planes, [(1, 1)] * len(planes), quant_luma, quant_chroma, restart_interval
    )


def encode_jpeg_420(
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    quant_luma: np.ndarray = QUANT_FLAT16,
    quant_chroma: np.ndarray = QUANT_FLAT17,
    restart_interval: int = 0,
) -> bytes:
    """Encode 4:2:0 chroma-subsampled YCbCr — the dominant real-world
    JPEG layout: each MCU interleaves four luma blocks (2x2 raster)
    with one Cb and one Cr block at half resolution. y must be
    (H, W) with H, W multiples of 16; cb/cr are (H/2, W/2)."""
    h, w = y.shape
    if h % 16 or w % 16:
        raise ValueError("4:2:0 needs dimensions in whole 16x16 MCUs")
    if cb.shape != (h // 2, w // 2) or cr.shape != (h // 2, w // 2):
        raise ValueError("chroma planes must be half resolution")
    return _encode_jpeg_any(
        [y, cb, cr], [(2, 2), (1, 1), (1, 1)], quant_luma, quant_chroma,
        restart_interval,
    )


def encode_jpeg_422(
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    quant_luma: np.ndarray = QUANT_FLAT16,
    quant_chroma: np.ndarray = QUANT_FLAT17,
    restart_interval: int = 0,
) -> bytes:
    """Encode 4:2:2 chroma-subsampled YCbCr (round 14) — the
    horizontal-only subsampling cameras and video frames use: each MCU
    is 16x8, interleaving two luma blocks side by side with one Cb and
    one Cr block at half HORIZONTAL resolution. y must be (H, W) with
    H a multiple of 8 and W of 16; cb/cr are (H, W/2)."""
    h, w = y.shape
    if h % 8 or w % 16:
        raise ValueError("4:2:2 needs H in whole 8s and W in whole 16s")
    if cb.shape != (h, w // 2) or cr.shape != (h, w // 2):
        raise ValueError("chroma planes must be half horizontal resolution")
    return _encode_jpeg_any(
        [y, cb, cr], [(2, 1), (1, 1), (1, 1)], quant_luma, quant_chroma,
        restart_interval,
    )


# ---------------------------------------------------------------------------
# progressive encoder (SOF2) — round 13
# ---------------------------------------------------------------------------

def _trunc_shift(v: int, al: int) -> int:
    """T.81 AC point transform: divide by 2^Al TOWARD ZERO (G.1.2.1;
    the DC point transform is the arithmetic shift, applied inline)."""
    return -((-v) >> al) if v < 0 else v >> al


def _canonical_progressive_script(nc: int) -> list:
    """The libjpeg-shaped simple-progression script the plain
    :func:`encode_jpeg_progressive` entry has always emitted."""
    allc = list(range(nc))
    script = [(allc, 0, 0, 0, 1)]
    script += [([ci], 1, 63, 0, 1) for ci in allc]
    script += [(allc, 0, 0, 1, 0)]
    script += [([ci], 1, 63, 1, 0) for ci in allc]
    return script


def _validate_script(script: list, nc: int) -> None:
    """T.81-legal, COMPLETE progressive script: DC-only or AC-only
    scans, AC non-interleaved, refinements step Al down by exactly one,
    a component's DC first scan precedes its AC scans, and every
    coefficient position ends at Al=0 (so decode == baseline holds)."""
    level: dict = {}
    for comps, ss, se, ah, al in script:
        if not comps or sorted(set(comps)) != sorted(comps):
            raise ValueError("scan components must be distinct and non-empty")
        if any(not (0 <= ci < nc) for ci in comps):
            raise ValueError("scan component out of range")
        if ss == 0:
            if se != 0:
                raise ValueError("DC scan must have Se=0")
            ks = [0]
        else:
            if not (1 <= ss <= se <= 63):
                raise ValueError(f"bad spectral band {ss}..{se}")
            if len(comps) != 1:
                raise ValueError("AC scans are non-interleaved")
            if level.get((comps[0], 0)) is None:
                raise ValueError("AC scan before the component's DC scan")
            ks = range(ss, se + 1)
        for ci in comps:
            for k in ks:
                cur = level.get((ci, k))
                if ah == 0:
                    if cur is not None:
                        raise ValueError(
                            f"position (c{ci}, k{k}) sent twice at Ah=0")
                    level[(ci, k)] = al
                else:
                    if ah != al + 1:
                        raise ValueError("refinement must step Al down by 1")
                    if cur != ah:
                        raise ValueError(
                            f"refinement of (c{ci}, k{k}) out of order")
                    level[(ci, k)] = al
    for ci in range(nc):
        for k in range(64):
            if level.get((ci, k)) != 0:
                raise ValueError(
                    f"incomplete script: (c{ci}, k{k}) ends at "
                    f"Al={level.get((ci, k))}")


def encode_jpeg_progressive(
    planes: list[np.ndarray],
    quant_luma: np.ndarray = QUANT_FLAT16,
    quant_chroma: np.ndarray = QUANT_FLAT17,
) -> bytes:
    """Encode 1 (grayscale) or 3 (YCbCr 4:4:4) uint8 planes as a
    PROGRESSIVE JPEG (SOF2) using the canonical simple-progression
    script (the libjpeg default shape):

      1. DC first scan, interleaved, successive approximation Al=1
      2-4. per-component AC first scans, band 1-63, Al=1
      5. DC refinement scan, interleaved, Ah=1 -> Al=0
      6-8. per-component AC refinement scans, band 1-63, Ah=1 -> Al=0

    Progressive mode changes only the TRANSMISSION ORDER of the same
    quantized coefficients, so decode(encode_jpeg_progressive(x)) ==
    decode(encode_jpeg(x)) EXACTLY — pinned by tests — and the
    constant-block closed-form oracle carries over unchanged.
    Delegates to :func:`encode_jpeg_progressive_script`; the canonical
    wire is byte-pinned by tests against the pre-refactor encoder.

    Scope: 4:4:4 sampling, no restart markers, encoder flushes each
    end-of-band as a plain EOB (EOBRUN length 1 — the Annex K AC tables
    carry no EOBn>0 symbols); the DECODER handles full EOBn runs, so
    foreign progressive files with custom tables and long EOB runs
    decode too."""
    return encode_jpeg_progressive_script(
        planes, None, quant_luma, quant_chroma)


def encode_jpeg_progressive_script(
    planes: list[np.ndarray],
    script: list | None = None,
    quant_luma: np.ndarray = QUANT_FLAT16,
    quant_chroma: np.ndarray = QUANT_FLAT17,
    samps: list | None = None,
) -> bytes:
    """Progressive (SOF2) encoder with an ARBITRARY scan script (round
    15 — the non-canonical spectral-selection / successive-approximation
    orders real encoders emit: mozjpeg/Photoshop band splits, deep Al
    ladders, luma-before-chroma orderings) and, with ``samps``, the
    subsampled layouts (4:2:0 / 4:2:2) progressive photos actually use.

    ``script`` is a list of ``(comps, Ss, Se, Ah, Al)`` scans; None
    means the canonical 8-scan script. ``samps`` is one (h_i, v_i)
    sampling pair per plane (None = all (1,1)); planes are given at
    their NATURAL resolution, like the baseline subsampled encoders.
    The script is validated to be T.81-legal and COMPLETE (every
    coefficient position reaches Al=0), so for ANY accepted script
    decode equals the baseline decode of the same planes exactly —
    pinned by tests across non-canonical scripts and samplings."""
    if len(planes) not in (1, 3):
        raise ValueError("1 or 3 planes")
    nc = len(planes)
    if samps is None:
        samps = [(1, 1)] * nc
    if len(samps) != nc:
        raise ValueError("one sampling pair per plane")
    hmax = max(sp[0] for sp in samps)
    vmax = max(sp[1] for sp in samps)
    ph, pw = planes[0].shape
    h = ph * vmax // samps[0][1]
    w = pw * hmax // samps[0][0]
    if h % (8 * vmax) or w % (8 * hmax):
        raise ValueError("dimensions must cover whole MCUs")
    for p, (hs, vs) in zip(planes, samps):
        if p.shape != (h * vs // vmax, w * hs // hmax):
            raise ValueError("plane shape inconsistent with sampling factors")

    if script is None:
        script = _canonical_progressive_script(nc)
    _validate_script(script, nc)

    qtabs = [np.asarray(quant_luma, dtype=np.int64)]
    if nc == 3:
        qtabs.append(np.asarray(quant_chroma, dtype=np.int64))

    # quantize every block up front (zigzag order per block), one grid
    # per component at its natural resolution
    grids = []  # per component: (gy, gx)
    coefs = []  # per component: (gy*gx, 64) int64
    for ci, plane in enumerate(planes):
        qt = qtabs[0 if ci == 0 else 1]
        gy, gx = plane.shape[0] // 8, plane.shape[1] // 8
        grids.append((gy, gx))
        cz = np.zeros((gy * gx, 64), dtype=np.int64)
        for b in range(gy * gx):
            y0, x0 = (b // gx) * 8, (b % gx) * 8
            block = plane[y0 : y0 + 8, x0 : x0 + 8].astype(np.int64) - 128
            cz[b] = _quantize(fdct8x8_int(block), qt)[ZIGZAG]
        coefs.append(cz)

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    for tid, qt in enumerate(qtabs):
        if int(qt.max()) > 255:  # Pq=1: 16-bit big-endian entries
            seg(0xDB, bytes([0x10 | tid])
                + b"".join(struct.pack(">H", int(qt[ZIGZAG[k]]))
                           for k in range(64)))
        else:
            seg(0xDB, bytes([tid]) + bytes(int(qt[ZIGZAG[k]]) for k in range(64)))

    body = struct.pack(">BHHB", 8, h, w, nc)
    for ci, (hs, vs) in enumerate(samps):
        body += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    seg(0xC2, body)  # SOF2: progressive DCT

    huffs = [(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS), (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS)]
    if nc == 3:
        huffs += [
            (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in huffs:
        seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))

    dc_enc = [_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)]
    ac_enc = [_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)]
    if nc == 3:
        dc_enc.append(_canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
        ac_enc.append(_canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS))

    def sos(scan_comps: list, ss: int, se: int, ah: int, al: int) -> None:
        body = bytes([len(scan_comps)])
        for ci in scan_comps:
            tsel = 0 if ci == 0 else 1
            # DC scans use the DC table id; AC scans the AC table id;
            # refinement DC scans need no table but the field is carried
            body += bytes([ci + 1, (tsel << 4) | tsel])
        body += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, body)

    def dc_order(scan_comps: list) -> list:
        """(ci, b) sequence for a DC scan: MCU walk when interleaved
        (B.2.3 — hs*vs blocks per comp per MCU), plain raster for a
        single-component scan."""
        if len(scan_comps) == 1:
            ci = scan_comps[0]
            return [(ci, b) for b in range(grids[ci][0] * grids[ci][1])]
        order = []
        mcus_x = w // (8 * hmax)
        mcus_y = h // (8 * vmax)
        for m in range(mcus_x * mcus_y):
            my, mx = divmod(m, mcus_x)
            for ci in scan_comps:
                hs, vs = samps[ci]
                gx = grids[ci][1]
                for v in range(vs):
                    for u in range(hs):
                        order.append((ci, (my * vs + v) * gx + mx * hs + u))
        return order

    for comps, ss, se, ah, al in script:
        sos(list(comps), ss, se, ah, al)
        wtr = _BitWriter()
        if ss == 0:
            if ah == 0:
                _emit_dc_first(wtr, coefs, dc_order(list(comps)), al, dc_enc)
            else:
                _emit_dc_refine(wtr, coefs, dc_order(list(comps)), al)
        else:
            ci = comps[0]
            actab = ac_enc[0 if ci == 0 else 1]
            nblocks = grids[ci][0] * grids[ci][1]
            if ah == 0:
                _emit_ac_first(wtr, coefs[ci], ss, se, al, nblocks, actab)
            else:
                _emit_ac_refine(wtr, coefs[ci], ss, se, ah, al, nblocks, actab)
        wtr.flush()
        out.extend(wtr.out)

    out.extend(b"\xff\xd9")
    return bytes(out)


def _emit_dc_first(wtr, coefs, order, al, dc_enc) -> None:
    """DC first scan: per-component DPCM of the arithmetic-shifted DC
    term over the given (ci, b) sequence (MCU order when
    interleaved)."""
    pred: dict = {}
    for ci, b in order:
        dc = int(coefs[ci][b][0]) >> al              # DC point transform
        size, bits = _magnitude(dc - pred.get(ci, 0))
        code, length = dc_enc[0 if ci == 0 else 1][size]
        wtr.write(code, length)
        if size:
            wtr.write(bits, size)
        pred[ci] = dc


def _emit_dc_refine(wtr, coefs, order, al) -> None:
    """DC refinement scan: one raw bit per (ci, b) — bit Al of the
    (two's-complement) DC term, matching the decoder's |=."""
    for ci, b in order:
        wtr.write((int(coefs[ci][b][0]) >> al) & 1, 1)


def _emit_ac_first(wtr, cz, ss, se, al, nblocks, actab) -> None:
    """AC first scan over band [Ss, Se] at point transform Al: (run,
    size) coding with ZRL, plain EOB per block (EOBRUN = 1)."""
    n = se - ss + 1
    for b in range(nblocks):
        zz = cz[b]
        band = [_trunc_shift(int(zz[k]), al) for k in range(ss, se + 1)]
        last = n - 1
        while last >= 0 and band[last] == 0:
            last -= 1
        run = 0
        for k in range(last + 1):
            v = band[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = actab[0xF0]
                wtr.write(code, length)
                run -= 16
            size, bits = _magnitude(v)
            code, length = actab[(run << 4) | size]
            wtr.write(code, length)
            wtr.write(bits, size)
            run = 0
        if last < n - 1:
            code, length = actab[0x00]               # EOB (EOBRUN = 1)
            wtr.write(code, length)


def _emit_ac_refine(wtr, cz, ss, se, ah, al, nblocks, actab) -> None:
    """AC refinement scan (Ah=Al+1) over band [Ss, Se]: newly
    significant coefficients as (run, 1) + sign, correction bits for
    already-significant ones buffered and flushed per T.81 G.1.2.3."""
    n = se - ss + 1
    for b in range(nblocks):
        zz = cz[b]
        hist = [_trunc_shift(int(zz[k]), ah) for k in range(ss, se + 1)]
        now = [_trunc_shift(int(zz[k]), al) for k in range(ss, se + 1)]
        last_new = -1
        for k in range(n):
            if hist[k] == 0 and now[k] != 0:
                last_new = k
        run = 0
        pend: list[int] = []                         # buffered corrections

        def emit(code_len):
            wtr.write(*code_len)

        k = 0
        while k <= last_new:
            if hist[k] != 0:
                pend.append(abs(now[k]) & 1)         # correction bit
            elif now[k] == 0:
                run += 1
                if run == 16:
                    emit(actab[0xF0])
                    for bit in pend:
                        wtr.write(bit, 1)
                    pend = []
                    run = 0
            else:
                # newly significant: magnitude must be 1 at this level
                emit(actab[(run << 4) | 1])
                wtr.write(1 if now[k] > 0 else 0, 1)
                for bit in pend:
                    wtr.write(bit, 1)
                pend = []
                run = 0
            k += 1
        if last_new < n - 1:
            emit(actab[0x00])                        # EOB (EOBRUN = 1)
            for bit in pend:
                wtr.write(bit, 1)
            pend = []
            # corrections for the rest of the band follow the EOB
            for j in range(last_new + 1, n):
                if hist[j] != 0:
                    wtr.write(abs(now[j]) & 1, 1)
        else:
            for bit in pend:
                wtr.write(bit, 1)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes):
    """Decode a baseline sequential JPEG: 8-bit, 1 or 3 components,
    4:4:4, 4:2:2 (round 14 — the camera/video horizontal-only
    subsampling), or 4:2:0 sampling. Returns (width, height, [planes]) with
    each plane at its NATURAL (possibly subsampled) resolution in
    component order (Y[, Cb, Cr]) — use :func:`upsample_chroma_nn` to
    bring 4:2:0 chroma to full resolution. Raises ValueError on
    anything outside the supported baseline subset."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    w = h = 0
    restart_interval = 0
    scan_sel = None

    while True:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI without scan
            raise ValueError("no scan data")
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 15
                if pq == 1:  # Pq=1: 16-bit big-endian entries (B.2.4.1)
                    zz = np.frombuffer(body, dtype=">u2", count=64,
                                       offset=o + 1).astype(np.int64)
                    step = 129
                elif pq == 0:
                    zz = np.frombuffer(body, dtype=np.uint8, count=64,
                                       offset=o + 1).astype(np.int64)
                    step = 65
                else:
                    raise ValueError(f"invalid DQT precision {pq}")
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = zz
                qtabs[tq] = nat
                o += step
        elif marker == 0xC4:  # DHT (possibly several tables)
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 15
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                vals = list(body[o + 17 : o + 17 + n])
                huff[(tc, th)] = _decode_map(bits, vals)
                o += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision")
            if nc not in (1, 3):
                raise ValueError("1 or 3 components")
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 15, tq))
            samp_set = [(hs, vs) for _, hs, vs, _ in comps]
            if not (
                all(s == (1, 1) for s in samp_set)
                or (nc == 3 and samp_set in ([(2, 2), (1, 1), (1, 1)],
                                             [(2, 1), (1, 1), (1, 1)]))
            ):
                raise ValueError("only 4:4:4, 4:2:2, or 4:2:0 sampling")
        elif marker == 0xC2:  # SOF2: progressive DCT (round-13 subset)
            return _decode_progressive(payload)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("unsupported SOF (not baseline or progressive)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan_sel = []
            for si in range(ns):
                cs, tsel = body[1 + 2 * si], body[2 + 2 * si]
                scan_sel.append((cs, tsel >> 4, tsel & 15))
            break
        # APPn / COM / anything else: skipped

    if comps is None or scan_sel is None:
        raise ValueError("missing SOF/SOS")
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    if h % (8 * vmax) or w % (8 * hmax):
        raise ValueError("dimensions must cover whole MCUs (no edge fill)")

    order = []
    for cs, dc_t, ac_t in scan_sel:
        ci = next(i for i, (cid, _, _, _) in enumerate(comps) if cid == cs)
        _, hs, vs, tq = comps[ci]
        order.append((ci, hs, vs, tq, dc_t, ac_t))

    planes = [
        np.zeros((h * vs // vmax, w * hs // hmax), dtype=np.uint8)
        for _, hs, vs, _ in comps
    ]
    rdr = _BitReader(payload, pos)
    pred = [0] * len(comps)
    mcus_x = w // (8 * hmax)
    mcus_y = h // (8 * vmax)
    rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            rdr.align_and_expect_rst(rst)
            rst += 1
            pred = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, hs, vs, tq, dc_t, ac_t in order:
            for sby in range(vs):
                for sbx in range(hs):
                    size = _decode_symbol(rdr, _table(huff, (0, dc_t), 'DC table'))
                    if size > 15:
                        # a corrupt DHT can map a code to any byte; a
                        # "size" past 15 would read hundreds of bits
                        # into an unbounded int (escapes as
                        # OverflowError at the int64 store)
                        raise ValueError(f"DC size {size} out of range")
                    diff = _extend(rdr.read(size), size) if size else 0
                    pred[ci] += diff
                    zz = np.zeros(64, dtype=np.int64)
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _decode_symbol(rdr, _table(huff, (1, ac_t), 'AC table'))
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("AC run past block end")
                        sz = rs & 15
                        zz[k] = _extend(rdr.read(sz), sz)
                        k += 1
                    coef = np.zeros(64, dtype=np.int64)
                    coef[ZIGZAG] = zz
                    coef *= _table(qtabs, tq, 'quant table')
                    y0 = (my * vs + sby) * 8
                    x0 = (mx * hs + sbx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = idct8x8_int(
                        coef.reshape(8, 8)
                    )
    return w, h, planes


def _decode_progressive(payload: bytes):
    """Decode a progressive (SOF2) JPEG: 8-bit, 1 or 3 components,
    4:4:4 / 4:2:2 / 4:2:0 sampling (round 15 widened the subsampled
    layouts — the dominant real-world progressive-photo shape), no
    restart markers. Coefficient buffers accumulate across scans — DC
    first/refinement (any Al ladder; interleaved MCU order or single-
    component raster), AC first scans with FULL EOBn run decoding, AC
    refinement scans with correction bits (T.81 G.1.2) — then one
    dequant+IDCT at EOI. Returns the baseline contract: (width,
    height, [planes]) with chroma at NATURAL (subsampled)
    resolution."""
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    w = h = 0
    coefs = None          # per component: (blocks, 64) int64, zigzag order
    eobrun = 0

    while True:
        # seek the next marker (skips any stray fill bytes)
        while payload[pos] != 0xFF or payload[pos + 1] in (0x00, 0xFF):
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 15
                if pq == 1:  # Pq=1: 16-bit big-endian entries (B.2.4.1)
                    zz = np.frombuffer(body, dtype=">u2", count=64,
                                       offset=o + 1).astype(np.int64)
                    step = 129
                elif pq == 0:
                    zz = np.frombuffer(body, dtype=np.uint8, count=64,
                                       offset=o + 1).astype(np.int64)
                    step = 65
                else:
                    raise ValueError(f"invalid DQT precision {pq}")
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = zz
                qtabs[tq] = nat
                o += step
        elif marker == 0xC4:
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 15
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                vals = list(body[o + 17 : o + 17 + n])
                huff[(tc, th)] = _decode_map(bits, vals)
                o += 17 + n
        elif marker == 0xC2:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision")
            if nc not in (1, 3):
                raise ValueError("1 or 3 components")
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 15, tq))
            samp_set = [(hs, vs) for _, hs, vs, _ in comps]
            if not (
                all(sp == (1, 1) for sp in samp_set)
                or (nc == 3 and samp_set in ([(2, 2), (1, 1), (1, 1)],
                                             [(2, 1), (1, 1), (1, 1)]))
            ):
                raise ValueError("only 4:4:4, 4:2:2, or 4:2:0 sampling")
            hmax = max(hs for _, hs, _, _ in comps)
            vmax = max(vs for _, _, vs, _ in comps)
            if h % (8 * vmax) or w % (8 * hmax):
                raise ValueError("dimensions must cover whole MCUs")
            grids = [
                (h * vs // vmax // 8, w * hs // hmax // 8)
                for _, hs, vs, _ in comps
            ]
            coefs = [
                np.zeros((gy * gx, 64), dtype=np.int64)
                for gy, gx in grids
            ]
        elif marker == 0xDD:
            (ri,) = struct.unpack_from(">H", body, 0)
            if ri:
                raise ValueError("restart markers outside the progressive subset")
        elif marker == 0xDA:
            if comps is None:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tsel = body[1 + 2 * si], body[2 + 2 * si]
                ci = next(i for i, (cid, *_rest) in enumerate(comps) if cid == cs)
                scan.append((ci, tsel >> 4, tsel & 15))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            rdr = _BitReader(payload, pos)
            eobrun = 0
            try:
                if ss == 0:  # DC scan
                    if se != 0:
                        raise ValueError("DC scan must have Se=0")
                    pred = [0] * len(scan)
                    # scan order: interleaved = MCU walk with hs*vs
                    # blocks per comp per MCU (B.2.3); single-component
                    # = that comp's raster order, no MCU structure
                    if len(scan) == 1:
                        ci0 = scan[0][0]
                        gy, gx = grids[ci0]
                        order = [(0, ci0, b) for b in range(gy * gx)]
                    else:
                        order = []
                        mcus_x = w // (8 * hmax)
                        mcus_y = h // (8 * vmax)
                        for m in range(mcus_x * mcus_y):
                            my, mx = divmod(m, mcus_x)
                            for si, (ci, _, _) in enumerate(scan):
                                _, hs, vs, _ = comps[ci]
                                gx = grids[ci][1]
                                for v in range(vs):
                                    for u in range(hs):
                                        order.append((
                                            si, ci,
                                            (my * vs + v) * gx + mx * hs + u,
                                        ))
                    for si, ci, b in order:
                        dc_t = scan[si][1]
                        if ah == 0:
                            size = _decode_symbol(rdr, _table(huff, (0, dc_t), 'DC table'))
                            if size > 15:
                                raise ValueError(f"DC size {size} out of range")
                            diff = _extend(rdr.read(size), size) if size else 0
                            pred[si] += diff
                            coefs[ci][b][0] = pred[si] << al
                        else:
                            if rdr.read(1):
                                coefs[ci][b][0] |= 1 << al
                else:  # AC scan: exactly one component (T.81)
                    if len(scan) != 1:
                        raise ValueError("AC scans are non-interleaved")
                    ci, _, ac_t = scan[0]
                    actab = _table(huff, (1, ac_t), 'AC table')
                    nblocks = grids[ci][0] * grids[ci][1]
                    for b in range(nblocks):
                        zz = coefs[ci][b]
                        if ah == 0:
                            eobrun = _ac_first_block(rdr, actab, zz, ss, se, al, eobrun)
                        else:
                            eobrun = _ac_refine_block(rdr, actab, zz, ss, se, al, eobrun)
            except _MarkerReached as mk:
                raise ValueError(f"scan data ended early (marker ff{mk.marker:02x})")
            pos = rdr.pos
        # APPn / COM: skipped

    if comps is None or coefs is None:
        raise ValueError("missing SOF2/scan data")
    planes = []
    for ci, (_, hs, vs, tq) in enumerate(comps):
        gy, gx = grids[ci]
        plane = np.zeros((gy * 8, gx * 8), dtype=np.uint8)
        qt = _table(qtabs, tq, 'quant table')
        for b in range(coefs[ci].shape[0]):
            nat = np.zeros(64, dtype=np.int64)
            nat[ZIGZAG] = coefs[ci][b]
            nat *= qt
            y0, x0 = (b // gx) * 8, (b % gx) * 8
            plane[y0 : y0 + 8, x0 : x0 + 8] = idct8x8_int(nat.reshape(8, 8))
        planes.append(plane)
    return w, h, planes


def _ac_first_block(rdr, actab, zz, ss, se, al, eobrun) -> int:
    """One block of an AC FIRST scan (Ah=0): (run, size) coding over the
    band with EOBn runs; new values enter at magnitude << Al (the
    inverse of the toward-zero point transform)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_symbol(rdr, actab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += rdr.read(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        zz[k] = _extend(rdr.read(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(rdr, actab, zz, ss, se, al, eobrun) -> int:
    """One block of an AC REFINEMENT scan (Ah=Al+1): newly-significant
    coefficients arrive as (run, 1) symbols with a sign bit; correction
    bits refine already-significant coefficients in band order (T.81
    G.1.2.3)."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_symbol(rdr, actab)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rdr.read(r)
                    break
                newval = 0          # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("refinement magnitude must be 1")
                newval = p1 if rdr.read(1) else m1
            while k <= se:
                if zz[k] != 0:
                    if rdr.read(1) and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                zz[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                if rdr.read(1) and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def upsample_chroma_nn(plane: np.ndarray, factor_h: int, factor_v: int) -> np.ndarray:
    """Nearest-neighbor chroma upsampling (the pinned reconstruction
    choice for 4:2:0 — each chroma sample replicates over its
    factor_v x factor_h luma footprint, so a constant chroma block is
    exactly constant after upsampling and the oracle closed form
    carries through unchanged)."""
    return np.repeat(np.repeat(plane, factor_v, axis=0), factor_h, axis=1)


# JFIF integer YCbCr -> RGB, the fixed-point kernel real decoders use
# (libjpeg scale 2^16); pinned here so the oracle can mirror it.
_CR_R, _CB_B = 91881, 116130
_CR_G, _CB_G = 46802, 22554


def ycbcr_to_rgb_int(y: np.ndarray, cb: np.ndarray, cr: np.ndarray):
    """Exact-integer JFIF color conversion: x >> 16 with +2^15 rounding,
    clamped to [0, 255]. Inputs/outputs uint8 arrays."""
    yl = y.astype(np.int64)
    cbl = cb.astype(np.int64) - 128
    crl = cr.astype(np.int64) - 128
    half = 1 << 15
    r = yl + ((_CR_R * crl + half) >> 16)
    g = yl - ((_CR_G * crl + _CB_G * cbl + half) >> 16)
    b = yl + ((_CB_B * cbl + half) >> 16)
    clip = lambda a: np.clip(a, 0, 255).astype(np.uint8)  # noqa: E731
    return clip(r), clip(g), clip(b)


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

def decode_jpeg_rgb_stats(df, id_col: str, bin_col: str):
    """REAL baseline-JPEG decode emitting EXACT integer pixel statistics:
    full marker walk, Annex-K Huffman entropy decode (tables rebuilt
    from the DHT segments), restart handling, fixed-point dequant+IDCT,
    then the pinned integer YCbCr->RGB kernel. Every output is a BIGINT
    a SQL oracle can recompute from the pixel generation rule, so the
    whole codec sits inside the cross-engine gate. Malformed payloads
    yield ok=false rows instead of failing the job.

    100 TB posture: one Arrow-batched mapInPandas pass; payloads never
    shuffle (the only downstream exchange is on doc-keyed integers)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ok", T.BooleanType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("r_sum", T.LongType()),
            T.StructField("g_sum", T.LongType()),
            T.StructField("b_sum", T.LongType()),
            T.StructField("y_sum", T.LongType()),
        ]
    )
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

    def decode(batches):
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "ok", "width", "height",
                                   "r_sum", "g_sum", "b_sum", "y_sum")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    w, h, planes = decode_jpeg(bytes(payload or b""))
                    if len(planes) == 3:
                        y_p, cb_p, cr_p = planes
                        if cb_p.shape != y_p.shape:  # 4:2:0 -> upsample
                            fv = y_p.shape[0] // cb_p.shape[0]
                            fh = y_p.shape[1] // cb_p.shape[1]
                            cb_p = upsample_chroma_nn(cb_p, fh, fv)
                            cr_p = upsample_chroma_nn(cr_p, fh, fv)
                        r, g, b = ycbcr_to_rgb_int(y_p, cb_p, cr_p)
                    else:
                        r = g = b = planes[0]
                except (ValueError, IndexError, OverflowError, StopIteration):
                    for k, v in (("ok", False), ("width", 0), ("height", 0),
                                 ("r_sum", 0), ("g_sum", 0), ("b_sum", 0),
                                 ("y_sum", 0)):
                        out[k].append(v)
                    continue
                out["ok"].append(True)
                out["width"].append(w)
                out["height"].append(h)
                out["r_sum"].append(int(r.astype(np.int64).sum()))
                out["g_sum"].append(int(g.astype(np.int64).sum()))
                out["b_sum"].append(int(b.astype(np.int64).sum()))
                out["y_sum"].append(int(planes[0].astype(np.int64).sum()))
            yield pd.DataFrame(out)

    return src.mapInPandas(decode, schema=schema)
