"""Transparent per-batch block compression (reference A21).

Parity with ``cpp/src/compression/``:
- Mode enum UNCOMPRESSED / ZFP_LOSSLESS / ZFP_LOSSY / DUMMY
  (``compressor_types.h:24-101``); params serialized into stream metadata
  (``cpp/src/writer.cpp:68-95`` ``compression_params_json``) so readers
  self-configure (``cpp/src/reader.cpp:34-79``).
- Compression is per write-batch, transparent to readers
  (``cpp/src/writer.cpp:219-232``, reader cache ``cpp/src/reader.cpp:186-232``).
- The reference's guard: compression requires fixed-width schemas
  (``cpp/src/writer.cpp:131-146``).

Codec substitutions for this environment:
- ZLIB (stdlib) provides the working lossless codec — same role as
  ZFP_LOSSLESS (bit-exact round trip).
- DUMMY mirrors the reference's no-op mode used in its integration tests.
- ZFP itself (esp. lossy tolerance) needs the zfp library, absent here —
  gated behind an import-try exactly like the reference's noop build flag
  (``cpp/src/compression/zfp_compressor_noop.cpp``).
"""

from __future__ import annotations

import enum
import json
import zlib

import numpy as np


class CompressionMode(enum.Enum):
    UNCOMPRESSED = "UNCOMPRESSED"
    ZLIB_LOSSLESS = "ZLIB_LOSSLESS"
    QUANT_LOSSY = "QUANT_LOSSY"
    ZFP_LOSSLESS = "ZFP_LOSSLESS"
    ZFP_LOSSY = "ZFP_LOSSY"
    DUMMY = "DUMMY"


def promote_int16(vals: np.ndarray) -> np.ndarray:
    """zfp promotes int16 blocks to int32 by shifting into the high bits
    (mirrors zfp_compressor.cpp:107-123, itself copying zfp_promote*).
    Ready for a real-zfp backend; kept here so the wire semantics are
    pinned by tests even while the codec itself is import-gated."""
    return vals.astype(np.int32) << 15


def demote_int16(vals: np.ndarray) -> np.ndarray:
    """Inverse demotion with clamp (zfp_compressor.cpp:155-170)."""
    return np.clip(vals >> 15, -0x8000, 0x7FFF).astype(np.int16)


class Compressor:
    def __init__(self, mode: CompressionMode, params: dict | None = None):
        self.mode = mode
        self.params = params or {}
        if mode in (CompressionMode.ZFP_LOSSLESS, CompressionMode.ZFP_LOSSY):
            try:
                import zfpy  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "ZFP compression requires the zfpy library, not present in "
                    "this environment (reference gates this identically via "
                    "zfp_compressor_noop.cpp); use ZLIB_LOSSLESS or DUMMY"
                ) from e

    # Like the reference, which hands ZFP a 2-D (num_cols x rows) array
    # (zfp_compressor.cpp:64-110), the sample block is byte-TRANSPOSED
    # before entropy coding: row-interleaved struct bytes defeat zlib, but
    # column-major byte planes (high bytes of a smooth signal are nearly
    # constant) compress well. sample_size rides in the params JSON so
    # readers invert the shuffle.
    def _shuffle(self, data: bytes) -> bytes:
        ss = int(self.params.get("sample_size", 0))
        if ss > 1 and len(data) % ss == 0:
            return np.frombuffer(data, np.uint8).reshape(-1, ss).T.tobytes()
        return data

    def _unshuffle(self, data: bytes) -> bytes:
        ss = int(self.params.get("sample_size", 0))
        if ss > 1 and len(data) % ss == 0:
            return np.frombuffer(data, np.uint8).reshape(ss, -1).T.tobytes()
        return data

    # Lossy mode (QUANT_LOSSY): the reference's ZFP_LOSSY accepts an
    # absolute tolerance (compressor_types.h:24-101); here each double/
    # float column is uniformly quantized to multiples of ``tolerance``
    # as int64 deltas, then delta+zlib coded. Reconstruction error is
    # <= tolerance/2 per value — the same abs-tolerance contract, accepted
    # in tests by the reference's Pearson-correlation criterion
    # (compressor_test.cpp:147-167). Requires a single-dtype schema
    # recorded in params (the writer sets value_dtype).
    def _quantize(self, data: bytes) -> bytes:
        tol = float(self.params["tolerance"])
        dtype = np.dtype(self.params["value_dtype"])
        vals = np.frombuffer(data, dtype=dtype).astype(np.float64)
        q = np.round(vals / tol).astype(np.int64)
        deltas = np.diff(q, prepend=q[:1] * 0)
        return zlib.compress(deltas.tobytes(), int(self.params.get("level", 1)))

    def _dequantize(self, data: bytes) -> bytes:
        tol = float(self.params["tolerance"])
        dtype = np.dtype(self.params["value_dtype"])
        deltas = np.frombuffer(zlib.decompress(data), dtype=np.int64)
        q = np.cumsum(deltas)
        return (q * tol).astype(dtype).tobytes()

    def compress(self, data: bytes) -> bytes:
        if self.mode is CompressionMode.UNCOMPRESSED:
            return data
        if self.mode is CompressionMode.DUMMY:
            return data  # cpp: DummyCompressor copies through
        if self.mode is CompressionMode.ZLIB_LOSSLESS:
            return zlib.compress(self._shuffle(data), int(self.params.get("level", 1)))
        if self.mode is CompressionMode.QUANT_LOSSY:
            return self._quantize(data)
        raise NotImplementedError(self.mode)

    def decompress(self, data: bytes) -> bytes:
        if self.mode in (CompressionMode.UNCOMPRESSED, CompressionMode.DUMMY):
            return data
        if self.mode is CompressionMode.ZLIB_LOSSLESS:
            return self._unshuffle(zlib.decompress(data))
        if self.mode is CompressionMode.QUANT_LOSSY:
            return self._dequantize(data)
        raise NotImplementedError(self.mode)

    # -- metadata wire format ------------------------------------------------
    def params_json(self) -> str:
        return json.dumps({"mode": self.mode.value, **self.params})

    @classmethod
    def from_params_json(cls, s: str | None) -> "Compressor":
        if not s:
            return cls(CompressionMode.UNCOMPRESSED)
        obj = json.loads(s)
        mode = CompressionMode(obj.pop("mode"))
        return cls(mode, obj)
