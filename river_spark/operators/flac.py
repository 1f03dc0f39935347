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

Subset: mono, 16-bit, fixed blocking, partition order 0 (one Rice
parameter per subframe), predictors order 0-4 chosen per block by
residual magnitude. LPC subframes and stereo decorrelation are out of
scope (the fixed-predictor path is the complete entropy/format layer;
LPC only swaps the predictor).

Reference scope parity: the reference stores opaque binary payloads;
decode here is a first-class distributed operator per SURVEY.md's
multimodal mandate.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_flac", "decode_flac"]


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
    """FLAC's extended UTF-8 coding of the frame number."""
    if n < 0x80:
        return bytes([n])
    if n < 0x800:
        return bytes([0xC0 | (n >> 6), 0x80 | (n & 0x3F)])
    if n < 0x10000:
        return bytes([0xE0 | (n >> 12), 0x80 | ((n >> 6) & 0x3F), 0x80 | (n & 0x3F)])
    raise ValueError("frame number too large for this subset")


def _read_utf8_number(rdr: _BitReader) -> int:
    b0 = rdr.read(8)
    if b0 < 0x80:
        return b0
    if b0 >> 5 == 0b110:
        n, extra = b0 & 0x1F, 1
    elif b0 >> 4 == 0b1110:
        n, extra = b0 & 0x0F, 2
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


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def encode_flac(
    sample_rate: int,
    samples: np.ndarray,
    block_size: int = 256,
    force_escape: bool = False,
) -> bytes:
    """Encode mono int16 samples. Each block becomes one frame; the
    best fixed predictor (order 0-4 by absolute-residual sum) is chosen
    per block, with CONSTANT detection and a VERBATIM fallback when
    Rice coding would expand."""
    samples = np.asarray(samples, dtype=np.int64)
    if samples.size == 0:
        raise ValueError("empty input")
    if not (2 <= block_size <= 256):
        raise ValueError("block_size in [2, 256] for this subset")
    if np.abs(samples).max() > 32767:
        raise ValueError("16-bit samples only")

    out = bytearray(b"fLaC")
    # STREAMINFO: last-block flag + type 0, length 34
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)   # min/max block size
    si += b"\x00\x00\x00" * 2                           # min/max frame size unknown
    # 20 bits rate | 3 bits channels-1 | 5 bits bps-1 | 36 bits total
    packed = (sample_rate << 44) | (0 << 41) | (15 << 36) | int(samples.size)
    si += packed.to_bytes(8, "big")
    si += b"\x00" * 16                                  # MD5 unknown
    out += bytes([0x80, 0, 0, 34]) + si

    for fi, off in enumerate(range(0, samples.size, block_size)):
        block = samples[off : off + block_size]
        out += _encode_frame(fi, block, block_size, force_escape)
    return bytes(out)


def _encode_frame(frame_no: int, block: np.ndarray, nominal_bs: int,
                  force_escape: bool = False) -> bytes:
    n = len(block)
    hdr = bytearray()
    hdr += bytes([0xFF, 0xF8])                # sync 11111111 111110 00
    # block size code 0110 (8-bit value follows) | rate code 0000
    hdr += bytes([0x60])
    # channel 0000 | sample size 100 (16 bit) | reserved 0
    hdr += bytes([0x08])
    hdr += _utf8_number(frame_no)
    hdr += bytes([n - 1])
    hdr += bytes([crc8(bytes(hdr))])

    wtr = _BitWriter()
    if np.all(block == block[0]):
        wtr.write(0, 1)
        wtr.write(0b000000, 6)                # CONSTANT
        wtr.write(0, 1)
        wtr.write(int(block[0]) & 0xFFFF, 16)
    else:
        best = None
        for order in range(5):
            if order >= n:
                break
            resid = _fixed_residual(block, order)
            u = _zigzag(resid)
            k = _best_rice_k(u)
            bits = 16 * order + 6 + int(np.sum((u >> k) + 1 + k))
            if best is None or bits < best[0]:
                best = (bits, order, resid, u, k)
        if best is None or best[0] >= 16 * n:
            wtr.write(0, 1)
            wtr.write(0b000001, 6)            # VERBATIM
            wtr.write(0, 1)
            for s in block:
                wtr.write(int(s) & 0xFFFF, 16)
        else:
            _, order, resid, u, k = best
            wtr.write(0, 1)
            wtr.write(0b001000 | order, 6)    # FIXED, order 0-4
            wtr.write(0, 1)
            for s in block[:order]:           # warmup
                wtr.write(int(s) & 0xFFFF, 16)
            wtr.write(0, 2)                   # residual method: Rice 4-bit
            wtr.write(0, 4)                   # partition order 0
            # the escape code exists for residuals whose unary quotients
            # would explode; 16-bit inputs never reach it organically,
            # so force_escape keeps the decode path honest in tests
            if force_escape:
                raw_bits = int(max(2, int(np.max(np.abs(resid))).bit_length() + 1))
                wtr.write(0b1111, 4)
                wtr.write(raw_bits, 5)
                for v in resid:
                    wtr.write(int(v) & ((1 << raw_bits) - 1), raw_bits)
            else:
                wtr.write(k, 4)
                for q in u:
                    wtr.unary(int(q) >> k)
                    if k:
                        wtr.write(int(q) & ((1 << k) - 1), k)
    wtr.align()
    frame = bytes(hdr) + bytes(wtr.out)
    return frame + struct.pack(">H", crc16(frame))


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_flac(payload: bytes):
    """Decode the supported subset. Returns (sample_rate, samples) with
    samples int16 numpy. Raises ValueError on malformed input, bad
    CRCs, or features outside the subset."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    rate = None
    total = None
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
            if channels != 1 or bps != 16:
                raise ValueError("subset is mono 16-bit")
        pos += 4 + blen
        if hdr & 0x80:
            break
    if rate is None:
        raise ValueError("missing STREAMINFO")

    out: list[int] = []
    expect_frame = 0
    while pos < len(payload) and len(out) < total:
        frame_start = pos
        rdr = _BitReader(payload, pos)
        sync = rdr.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad frame sync at {pos}")
        if rdr.read(1) != 0:
            raise ValueError("reserved bit set")
        rdr.read(1)  # blocking strategy (fixed)
        bs_code = rdr.read(4)
        sr_code = rdr.read(4)
        ch_code = rdr.read(4)
        ss_code = rdr.read(3)
        rdr.read(1)  # reserved
        if ch_code != 0 or ss_code != 0b100:
            raise ValueError("subset is mono 16-bit frames")
        frame_no = _read_utf8_number(rdr)
        if frame_no != expect_frame:
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

        # subframe (mono: exactly one)
        if rdr.read(1) != 0:
            raise ValueError("subframe padding bit set")
        stype = rdr.read(6)
        if rdr.read(1) != 0:
            raise ValueError("wasted bits unsupported in subset")
        if stype == 0b000000:  # CONSTANT
            v = rdr.read(16)
            v = v - 0x10000 if v >= 0x8000 else v
            block = [v] * n
        elif stype == 0b000001:  # VERBATIM
            block = []
            for _ in range(n):
                v = rdr.read(16)
                block.append(v - 0x10000 if v >= 0x8000 else v)
        elif 0b001000 <= stype <= 0b001100:  # FIXED order 0-4
            order = stype & 0x7
            warm = []
            for _ in range(order):
                v = rdr.read(16)
                warm.append(v - 0x10000 if v >= 0x8000 else v)
            if rdr.read(2) != 0:
                raise ValueError("only 4-bit Rice residuals in subset")
            if rdr.read(4) != 0:
                raise ValueError("only partition order 0 in subset")
            k = rdr.read(4)
            resid = []
            if k == 0b1111:  # escape: raw two's-complement
                raw_bits = rdr.read(5)
                for _ in range(n - order):
                    v = rdr.read(raw_bits)
                    if v >= 1 << (raw_bits - 1):
                        v -= 1 << raw_bits
                    resid.append(v)
            else:
                for _ in range(n - order):
                    q = rdr.unary()
                    u = (q << k) | (rdr.read(k) if k else 0)
                    resid.append(_unzigzag(u))
            block = list(warm)
            coeffs = _FIXED_COEFFS[order]
            for r in resid:
                pred = sum(c * block[-i - 1] for i, c in enumerate(coeffs))
                block.append(pred + r)
        else:
            raise ValueError("LPC subframes outside the subset")

        rdr.align()
        body_end = rdr.byte_pos()
        if body_end + 2 > len(payload):
            raise ValueError("truncated frame footer")
        (crc_got,) = struct.unpack_from(">H", payload, body_end)
        if crc16(payload[frame_start:body_end]) != crc_got:
            raise ValueError("frame CRC-16 mismatch")
        pos = body_end + 2
        out.extend(block)
        expect_frame += 1
    if len(out) != total:
        raise ValueError(f"decoded {len(out)} of {total} samples")
    return int(rate), np.asarray(out, dtype=np.int16)


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
                except (ValueError, IndexError, struct.error):
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
