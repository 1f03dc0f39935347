"""IMA (DVI) ADPCM in a WAV container (format tag 0x0011), pure numpy.

Extends the audio half of the live-codec family (multimodal.py: PCM and
mu-law WAV) with a real compressed audio format: 4-bit IMA ADPCM, the
adaptive delta coder shipped in every RIFF stack. Blocks carry a
(predictor, step-index) header and a nibble stream; the decoder is the
standard table-driven state machine (step table of 89 entries, index
table [-1,-1,-1,-1,2,4,6,8], low nibble first).

ADPCM is lossy and SEQUENTIAL, so unlike the DCT closed form
(jpeg.py) an arbitrary input has no SQL-expressible reconstruction.
The driver-gated fixture (mm_adpcm_decode_stats) therefore uses
all-zero nibbles with per-block rule-generated headers: a zero nibble
adds step>>3 and decays the index by 1, so every decoded sample is a
prefix sum over a closed-form step-table walk the oracle mirrors with
a literal 89-entry list. The full quantizer (all 16 nibbles, sign
bits, clamping, encoder/decoder state lockstep) is pinned by
tests/test_adpcm_codec.py.

Reference scope parity: the reference stores opaque binary payloads;
decode here is a first-class distributed operator per SURVEY.md's
multimodal mandate.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_adpcm_wav",
    "decode_adpcm_wav",
    "build_adpcm_fixture_wav",
    "STEP_TABLE",
    "INDEX_TABLE",
]

STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
        19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
        50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
        130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
        337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
        876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
        5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
        15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)
INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _decode_nibble(nibble: int, pred: int, index: int) -> tuple[int, int]:
    """One standard IMA step: returns (new predictor, new index)."""
    step = int(STEP_TABLE[index])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        pred -= diff
    else:
        pred += diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + int(INDEX_TABLE[nibble & 7])))
    return pred, index


def _encode_sample(sample: int, pred: int, index: int) -> tuple[int, int, int]:
    """Standard greedy IMA quantizer: returns (nibble, new predictor,
    new index) with the predictor tracking the DECODER's reconstruction
    exactly (the lockstep property tests assert)."""
    step = int(STEP_TABLE[index])
    delta = sample - pred
    nibble = 0
    if delta < 0:
        nibble = 8
        delta = -delta
    if delta >= step:
        nibble |= 4
        delta -= step
    if delta >= step >> 1:
        nibble |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        nibble |= 1
    return (nibble,) + _decode_nibble(nibble, pred, index)


def encode_adpcm_wav(
    sample_rate: int,
    samples: np.ndarray,
    block_align: int = 256,
    initial_index: int = 0,
) -> bytes:
    """Encode mono int16 samples as IMA ADPCM WAV. Each block holds
    1 + 2*(block_align-4) samples; the final block is zero-padded in
    the nibble domain (silence nibbles = 0). block_align >= 8."""
    if block_align < 8:
        raise ValueError("block_align >= 8")
    samples = np.asarray(samples, dtype=np.int64)
    spb = 1 + 2 * (block_align - 4)
    n = len(samples)
    n_blocks = max(1, -(-n // spb))
    data = bytearray()
    index = initial_index
    for b in range(n_blocks):
        chunk = samples[b * spb : (b + 1) * spb]
        pred = int(chunk[0]) if len(chunk) else 0
        data += struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for s in chunk[1:]:
            nib, pred, index = _encode_sample(int(s), pred, index)
            nibbles.append(nib)
        while len(nibbles) < 2 * (block_align - 4):
            nib, pred, index = _encode_sample(pred, pred, index)
            nibbles.append(nib)
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            data.append(lo | (hi << 4))

    byte_rate = sample_rate * block_align // spb  # nominal
    hdr = b"RIFF" + struct.pack("<I", 4 + 8 + 20 + 8 + 4 + 8 + len(data)) + b"WAVE"
    fmt = struct.pack(
        "<HHIIHHHH", 0x0011, 1, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    fact = struct.pack("<I", n_blocks * spb)
    return (
        hdr
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + bytes(data)
    )


def decode_adpcm_wav(payload: bytes):
    """Decode mono IMA ADPCM WAV. Returns (sample_rate, samples) with
    samples int16 numpy. Raises ValueError outside the subset."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError("chunk past end of file")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("short fmt chunk")
    tag, nch, rate, _br, block_align, bps = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag != 0x0011:
        raise ValueError("not IMA ADPCM (format tag 0x0011)")
    if nch != 1:
        raise ValueError("mono only")
    if bps != 4:
        raise ValueError("4-bit nibbles only")
    if block_align < 8 or len(data) % block_align:
        raise ValueError("data is not whole blocks")

    spb = 1 + 2 * (block_align - 4)
    out = np.empty(len(data) // block_align * spb, dtype=np.int16)
    w = 0
    for off in range(0, len(data), block_align):
        pred, index, _rsv = struct.unpack_from("<hBB", data, off)
        if index > 88:
            raise ValueError("step index out of range")
        out[w] = pred
        w += 1
        for byte in data[off + 4 : off + block_align]:
            for nib in (byte & 15, byte >> 4):
                pred, index = _decode_nibble(nib, pred, index)
                out[w] = pred
                w += 1
    return rate, out




def build_adpcm_fixture_wav(
    sample_rate: int,
    blocks: list,
    block_align: int = 16,
) -> bytes:
    """Assemble an IMA ADPCM WAV from explicit (predictor, step_index,
    nibble_bytes) blocks — the oracle fixture path: rule-generated
    headers with all-zero nibble streams keep every decoded sample a
    closed-form prefix sum (module docstring). The real encoder is
    pinned separately by the lockstep tests."""
    spb = 1 + 2 * (block_align - 4)
    data = bytearray()
    for pred, index, nib_bytes in blocks:
        if len(nib_bytes) != block_align - 4:
            raise ValueError("nibble payload must fill the block")
        data += struct.pack("<hBB", pred, index, 0)
        data += nib_bytes
    byte_rate = sample_rate * block_align // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x0011, 1, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    fact = struct.pack("<I", len(blocks) * spb)
    hdr = b"RIFF" + struct.pack("<I", 4 + 8 + 20 + 8 + 4 + 8 + len(data)) + b"WAVE"
    return (
        hdr
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + bytes(data)
    )


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

def decode_adpcm_stats(df, id_col: str, bin_col: str):
    """REAL IMA-ADPCM decode emitting EXACT integer sample statistics:
    RIFF chunk walk, per-block header parse, the full nibble state
    machine, then BIGINTs a SQL oracle can recompute for the
    closed-form fixture. Malformed payloads yield ok=false rows. One
    Arrow-batched mapInPandas pass; payloads never shuffle."""
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
            T.StructField("last_sample", T.LongType()),
        ]
    )
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

    def decode(batches):
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "ok", "sample_rate",
                                   "n_samples", "sample_sum", "last_sample")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    rate, samples = decode_adpcm_wav(bytes(payload or b""))
                except (ValueError, struct.error, IndexError, OverflowError):
                    for k, v in (("ok", False), ("sample_rate", 0),
                                 ("n_samples", 0), ("sample_sum", 0),
                                 ("last_sample", 0)):
                        out[k].append(v)
                    continue
                s = samples.astype(np.int64)
                out["ok"].append(True)
                out["sample_rate"].append(int(rate))
                out["n_samples"].append(int(s.size))
                out["sample_sum"].append(int(s.sum()))
                out["last_sample"].append(int(s[-1]) if s.size else 0)
            yield pd.DataFrame(out)

    return src.mapInPandas(decode, schema=schema)
