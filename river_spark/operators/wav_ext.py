"""Extended-format WAV: 8/24/32-bit PCM, IEEE float32/64, A-law, and
WAVE_FORMAT_EXTENSIBLE — the real-world studio/DAW/telephony layouts
beyond the 16-bit PCM + mu-law core in operators/multimodal.py.

Format coverage (RIFF fmt tag → sample layout):
- 1 (PCM): 8-bit UNSIGNED (offset-128), 16-bit, 24-bit packed 3-byte
  little-endian, 32-bit — integer samples returned sign-corrected at
  native magnitude (8-bit -> [-128,127], 24-bit -> int32-sign-extended).
- 3 (IEEE float): float32 / float64, returned as numpy floats.
- 6 (A-law) / 7 (mu-law): 8-bit companded telephony bytes expanded to
  int16 through the exact G.711 segment formulas.
- 0xFFFE (EXTENSIBLE): the 40-byte fmt with cbSize=22, valid-bits,
  channel mask, and the 16-byte SubFormat GUID whose first two bytes
  are the effective tag (PCM / float / A-law / mu-law) followed by the
  fixed KSDATAFORMAT_SUBTYPE suffix — how every >2-channel or >16-bit
  WAV in the wild is actually written.

The 16-bit PCM and mu-law paths in multimodal.decode_wav_any are
wire-pinned by standing tests and stay untouched; this module is the
widened superset entry. The reference engine has no audio codecs
(its scope is stream transport, src/river/river.pyx) — this belongs to
the training-data multimodal family (SURVEY.md). Spark-side, payloads
stay inside Arrow-batched ``mapInPandas`` and never shuffle; malformed
payloads raise ValueError/struct.error (corruption-fuzzed).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from river_spark.operators.multimodal import mulaw_to_linear

# KSDATAFORMAT_SUBTYPE GUID suffix shared by all wave subformats: the
# effective format tag goes in the first two bytes.
_GUID_SUFFIX = bytes(
    [0x00, 0x00, 0x00, 0x00, 0x10, 0x00, 0x80, 0x00,
     0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71]
)

# Allocation bound: a data chunk may not claim more than 2^28 bytes
# here (fixture payloads are tiny; real WAVs are bounded by the RIFF
# 4 GiB limit anyway — this keeps corrupt headers from driving big
# frombuffer copies).
_MAX_DATA_BYTES = 1 << 28


def alaw_to_linear(a: "np.ndarray") -> "np.ndarray":
    """Exact G.711 A-law expansion (vectorized): toggle the even bits
    (0x55), then the segment formula — seg 0: (mant<<4)+8, else
    ((mant<<4)+0x108) << (seg-1), sign from bit 7."""
    a = np.asarray(a, dtype=np.uint8)
    u = a ^ 0x55
    seg = (u >> 4) & 0x07
    mant = (u & 0x0F).astype(np.int32)
    mag = np.where(
        seg == 0,
        (mant << 4) + 8,
        ((mant << 4) + 0x108) << np.maximum(seg.astype(np.int32) - 1, 0),
    )
    return np.where(u & 0x80, mag, -mag).astype(np.int16)


def _fmt_body(tag, n_channels, sample_rate, bits):
    block = n_channels * (bits // 8)
    return struct.pack(
        "<HHIIHH", tag, n_channels, sample_rate, sample_rate * block, block, bits
    )


def encode_wav_ext(
    sample_rate: int,
    n_channels: int,
    samples: "np.ndarray",
    fmt: int = 1,
    bits: int = 16,
    extensible: bool = False,
    channel_mask: int = 0,
) -> bytes:
    """Encode interleaved samples into a RIFF/WAVE payload.

    ``samples``: 1-D interleaved. Integer formats expect sign-corrected
    native-magnitude ints (8-bit in [-128,127] etc.); float formats
    expect floats; A-law/mu-law (fmt 6/7) expect RAW companded bytes.
    ``extensible`` wraps the format in WAVE_FORMAT_EXTENSIBLE with the
    SubFormat GUID carrying ``fmt``.
    """
    if fmt == 1:
        if bits == 8:
            data = (np.asarray(samples, np.int64) + 128).astype(np.uint8).tobytes()
        elif bits == 16:
            data = np.asarray(samples, np.int64).astype("<i2").tobytes()
        elif bits == 24:
            s = np.asarray(samples, np.int64).astype(np.int64)
            u = (s & 0xFFFFFF).astype(np.uint32)
            b = np.empty((u.size, 3), np.uint8)
            b[:, 0] = u & 0xFF
            b[:, 1] = (u >> 8) & 0xFF
            b[:, 2] = (u >> 16) & 0xFF
            data = b.tobytes()
        elif bits == 32:
            data = np.asarray(samples, np.int64).astype("<i4").tobytes()
        else:
            raise ValueError(f"unsupported PCM width {bits}")
    elif fmt == 3:
        if bits == 32:
            data = np.asarray(samples, np.float64).astype("<f4").tobytes()
        elif bits == 64:
            data = np.asarray(samples, np.float64).astype("<f8").tobytes()
        else:
            raise ValueError(f"unsupported float width {bits}")
    elif fmt in (6, 7):
        if bits != 8:
            raise ValueError("companded formats are 8-bit")
        data = np.asarray(samples, np.uint8).tobytes()
    else:
        raise ValueError(f"unsupported format tag {fmt}")

    if extensible:
        body = _fmt_body(0xFFFE, n_channels, sample_rate, bits)
        body += struct.pack("<HHI", 22, bits, channel_mask)
        body += struct.pack("<H", fmt) + _GUID_SUFFIX
    else:
        body = _fmt_body(fmt, n_channels, sample_rate, bits)
    pad = b"\x00" if len(data) & 1 else b""
    riff = (
        b"fmt " + struct.pack("<I", len(body)) + body
        + b"data" + struct.pack("<I", len(data)) + data + pad
    )
    return b"RIFF" + struct.pack("<I", 4 + len(riff)) + b"WAVE" + riff


def decode_wav_ext(payload: bytes):
    """Decode any supported WAV layout.

    Returns ``(sample_rate, n_channels, bits, tag, extensible,
    samples)`` where ``tag`` is the EFFECTIVE format (the SubFormat
    tag for extensible files) and ``samples`` is 1-D interleaved:
    int16/int32 for integer and companded formats, float32/float64 for
    IEEE float. Raises ValueError on framing, GUID, width, or
    block-alignment defects.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        csize = struct.unpack_from("<I", payload, pos + 4)[0]
        if csize > _MAX_DATA_BYTES:
            raise ValueError("chunk exceeds the allocation bound")
        body = payload[pos + 8 : pos + 8 + csize]
        if len(body) != csize:
            raise ValueError("truncated chunk body")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("missing fmt/data chunk")
    tag, n_channels, sample_rate = struct.unpack_from("<HHI", fmt, 0)
    block_align = struct.unpack_from("<H", fmt, 12)[0]
    bits = struct.unpack_from("<H", fmt, 14)[0]
    extensible = False
    if tag == 0xFFFE:
        if len(fmt) < 40:
            raise ValueError("truncated extensible fmt chunk")
        cb = struct.unpack_from("<H", fmt, 16)[0]
        if cb < 22:
            raise ValueError(f"extensible cbSize {cb} < 22")
        valid_bits = struct.unpack_from("<H", fmt, 18)[0]
        guid = fmt[24:40]
        if guid[2:16] != _GUID_SUFFIX:
            raise ValueError("unknown SubFormat GUID")
        tag = struct.unpack_from("<H", guid, 0)[0]
        if valid_bits > bits:
            raise ValueError("valid bits exceed the container width")
        extensible = True
    if n_channels < 1:
        raise ValueError("channel count must be >= 1")
    width = bits // 8
    if width == 0 or block_align != n_channels * width:
        raise ValueError(
            f"block align {block_align} != channels*width {n_channels * width}"
        )
    if len(data) % width:
        raise ValueError("data chunk not a whole number of samples")

    if tag == 1:
        if bits == 8:
            samples = np.frombuffer(data, np.uint8).astype(np.int16) - 128
        elif bits == 16:
            samples = np.frombuffer(data, "<i2")
        elif bits == 24:
            b = np.frombuffer(data, np.uint8).reshape(-1, 3).astype(np.uint32)
            u = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            samples = (u.astype(np.int32) << 8) >> 8  # sign-extend 24 bits
        elif bits == 32:
            samples = np.frombuffer(data, "<i4")
        else:
            raise ValueError(f"unsupported PCM width {bits}")
    elif tag == 3:
        if bits == 32:
            samples = np.frombuffer(data, "<f4")
        elif bits == 64:
            samples = np.frombuffer(data, "<f8")
        else:
            raise ValueError(f"unsupported float width {bits}")
    elif tag == 6:
        if bits != 8:
            raise ValueError("A-law is 8-bit")
        samples = alaw_to_linear(np.frombuffer(data, np.uint8))
    elif tag == 7:
        if bits != 8:
            raise ValueError("mu-law is 8-bit")
        samples = mulaw_to_linear(np.frombuffer(data, np.uint8))
    else:
        raise ValueError(f"unsupported WAV format tag {tag}")
    if samples.size % n_channels:
        raise ValueError("sample count not divisible by channel count")
    return sample_rate, n_channels, bits, tag, extensible, samples


_WAV_EXT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("fmt_tag", T.IntegerType()),
        T.StructField("extensible", T.BooleanType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("samp_sum", T.LongType()),
        T.StructField("pos_weighted_sum", T.LongType()),
    ]
)


def decode_wav_ext_stats(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """REAL extended-WAV decode emitting exact integer statistics: the
    sample sum and a position-weighted checksum over the interleaved
    order (pins width/sign-extension/GUID resolution — a 24-bit
    byte-order or sign bug moves a BIGINT). Float samples in the
    fixtures are integer-valued by construction, so their sums are
    exact after rounding to int64. Malformed payloads become ok=False
    rows (catch set matches the corruption fuzz)."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))
    cols = [f.name for f in _WAV_EXT_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    rate, nch, bits, tag, ext, s = decode_wav_ext(
                        bytes(payload) if payload else b""
                    )
                except (ValueError, OverflowError, struct.error):
                    for k, v in (
                        ("ok", False), ("sample_rate", 0), ("n_channels", 0),
                        ("bits", 0), ("fmt_tag", 0), ("extensible", False),
                        ("n_samples", 0), ("samp_sum", 0),
                        ("pos_weighted_sum", 0),
                    ):
                        out[k].append(v)
                    continue
                si = np.rint(s).astype(np.int64)
                p = np.arange(si.size, dtype=np.int64)
                out["ok"].append(True)
                out["sample_rate"].append(rate)
                out["n_channels"].append(nch)
                out["bits"].append(bits)
                out["fmt_tag"].append(tag)
                out["extensible"].append(ext)
                out["n_samples"].append(int(si.size))
                out["samp_sum"].append(int(si.sum()))
                out["pos_weighted_sum"].append(int(((p % 997 + 1) * si).sum()))
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=_WAV_EXT_SCHEMA)


def decode_audio_any(payload: bytes):
    """Decode ANY supported audio payload with the in-repo family
    (round 15 — the audio twin of multimodal.decode_image_any).

    Dispatch: ``fLaC`` magic -> operators/flac.py (all gated depths /
    channel layouts); RIFF/WAVE -> by format tag: 1/3/6/7/0xFFFE via
    :func:`decode_wav_ext` (PCM widths, float, A-law/mu-law,
    EXTENSIBLE), 0x0011 IMA ADPCM via operators/adpcm.py, 0x0002
    MS-ADPCM via operators/ms_adpcm.py.

    Returns ``(sample_rate, n_channels, samples)`` with samples 1-D
    interleaved in the decoder's native dtype (ints for integer and
    companded formats, float32/64 for IEEE float). Raises ValueError
    for unrecognized containers or unsupported tags.
    """
    if payload[:4] == b"fLaC":
        from river_spark.operators.flac import decode_flac

        rate, samples = decode_flac(payload)
        if samples.ndim == 1:
            return rate, 1, samples
        return rate, samples.shape[1], samples.reshape(-1)
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        pos, tag = 12, None
        while pos + 8 <= len(payload):
            if payload[pos : pos + 4] == b"fmt ":
                tag = struct.unpack_from("<H", payload, pos + 8)[0]
                break
            csize = struct.unpack_from("<I", payload, pos + 4)[0]
            pos += 8 + csize + (csize & 1)
        if tag == 0x0011:
            from river_spark.operators.adpcm import decode_adpcm_wav

            rate, samples = decode_adpcm_wav(payload)
            return rate, 1, samples
        if tag == 0x0002:
            from river_spark.operators.ms_adpcm import decode_ms_adpcm_wav

            return decode_ms_adpcm_wav(payload)
        rate, nch, _bits, _tag, _ext, samples = decode_wav_ext(payload)
        return rate, nch, samples
    raise ValueError("unrecognized audio container")
