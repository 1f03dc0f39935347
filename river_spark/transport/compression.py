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
- ZFP_LOSSLESS / ZFP_LOSSY are fully implemented against ``zfpy`` with
  the reference's exact layout — 2-D field of (num_cols x num_rows),
  full codestream header, reversible mode for lossless / absolute
  tolerance for lossy, int16 promoted/demoted through int32 high bits
  (``zfp_compressor.cpp:64-170``) — and the reference's params wire
  names (``num_cols``/``data_type``/``tolerance``,
  ``compressor.cpp:56-82``). zfpy is absent in THIS container, so the
  modes are import-gated exactly like the reference's noop build flag
  (``zfp_compressor_noop.cpp``); the parity tests skip without zfpy and
  run verbatim wherever it exists.

``params_json`` uses the reference's metadata wire shape
``{"name": ..., "params": {str: str}}`` (``cpp/src/writer.cpp:89-95``)
so a reference reader on the same Redis server self-configures from our
metadata hash; the legacy flat form is still accepted on read.
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


# reference data_type param values -> numpy dtypes (compressor.cpp:56-82)
_ZFP_DTYPES = {
    "int16": np.dtype(np.int16),
    "int32": np.dtype(np.int32),
    "float": np.dtype(np.float32),
    "double": np.dtype(np.float64),
}


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

    # -- real ZFP (zfpy-backed), reference layout ----------------------------
    def _zfp_compress(self, data: bytes) -> bytes:
        """Reference layout (zfp_compressor.cpp:64-140): row-major samples
        viewed as a 2-D field of num_cols x num_rows, int16 promoted into
        int32 high bits, reversible mode when lossless (tolerance -1) else
        absolute-accuracy mode, full header in the codestream. zfpy's
        compress_numpy makes the same C calls (zfp_write_header FULL +
        zfp_compress), so equal params give the reference's exact bytes."""
        import zfpy

        dtype = _ZFP_DTYPES[self.params["data_type"]]
        num_cols = int(self.params["num_cols"])
        vals = np.frombuffer(data, dtype=dtype)
        if len(vals) % num_cols:
            raise ValueError(f"{len(vals)} values not divisible by num_cols={num_cols}")
        if dtype == np.int16:
            vals = promote_int16(vals)
        arr = np.ascontiguousarray(vals.reshape(-1, num_cols))
        if self.mode is CompressionMode.ZFP_LOSSY:
            comp = zfpy.compress_numpy(arr, tolerance=float(self.params["tolerance"]))
        else:
            comp = zfpy.compress_numpy(arr)  # no constraints -> reversible
        # parity bridge: the emitted codestream must open with exactly the
        # header our pure-Python layout predicts (transport/zfp_header.py)
        # — any drift in field/mode wiring vs the reference's params
        # surfaces here, in every environment that has zfpy at all.
        want = self.expected_zfp_header(num_rows=arr.shape[0])
        if comp[: len(want)] != want:
            raise AssertionError(
                f"zfpy header {comp[:len(want)].hex()} != predicted {want.hex()}"
            )
        return comp

    def expected_zfp_header(self, num_rows: int) -> bytes:
        """The 12 bytes any conforming writer (zfpy, the reference's C++)
        puts in front of a block with these params — pure Python, usable
        (and tested) without zfpy."""
        from river_spark.transport.zfp_header import expected_header

        data_type = self.params["data_type"]
        field_type = "int32" if data_type == "int16" else data_type  # promoted
        tol = (
            float(self.params["tolerance"])
            if self.mode is CompressionMode.ZFP_LOSSY
            else None
        )
        return expected_header(int(self.params["num_cols"]), num_rows, field_type, tol)

    def _zfp_decompress(self, data: bytes) -> bytes:
        import zfpy

        from river_spark.transport.zfp_header import parse_header

        # zfpy-free sanity gate first: reject blobs whose header doesn't
        # match this stream's metadata params, with a readable error
        # instead of a codec-level failure.
        hdr = parse_header(bytes(data[:12]))
        num_cols = int(self.params["num_cols"])
        if hdr.get("nx") != num_cols:
            raise ValueError(
                f"zfp blob header nx={hdr.get('nx')} != stream num_cols={num_cols}"
            )
        arr = zfpy.decompress_numpy(bytes(data))
        if self.params.get("data_type") == "int16":
            arr = demote_int16(arr)
        return np.ascontiguousarray(arr).tobytes()

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
        if self.mode in (CompressionMode.ZFP_LOSSLESS, CompressionMode.ZFP_LOSSY):
            return self._zfp_compress(data)
        raise NotImplementedError(self.mode)

    def decompress(self, data: bytes) -> bytes:
        if self.mode in (CompressionMode.UNCOMPRESSED, CompressionMode.DUMMY):
            return data
        if self.mode is CompressionMode.ZLIB_LOSSLESS:
            return self._unshuffle(zlib.decompress(data))
        if self.mode is CompressionMode.QUANT_LOSSY:
            return self._dequantize(data)
        if self.mode in (CompressionMode.ZFP_LOSSLESS, CompressionMode.ZFP_LOSSY):
            return self._zfp_decompress(data)
        raise NotImplementedError(self.mode)

    # -- metadata wire format ------------------------------------------------
    def params_json(self) -> str:
        """Reference wire shape (cpp/src/writer.cpp:89-95): the name plus a
        string-valued params map, so a reference reader sharing the Redis
        server can self-configure from our metadata hash."""
        return json.dumps(
            {"name": self.mode.value, "params": {k: str(v) for k, v in self.params.items()}}
        )

    @classmethod
    def from_params_json(cls, s: str | None) -> "Compressor":
        if not s:
            return cls(CompressionMode.UNCOMPRESSED)
        try:
            obj = json.loads(s)
            if "name" in obj:  # reference wire form
                return cls(CompressionMode(obj["name"]), dict(obj.get("params") or {}))
            mode = CompressionMode(obj.pop("mode"))  # legacy flat form
            return cls(mode, obj)
        except (KeyError, TypeError, AttributeError, json.JSONDecodeError) as exc:
            # wire metadata (possibly a foreign writer's hash): raise a
            # diagnosable error, not a bare KeyError/TypeError
            raise ValueError(f"malformed compression params {s!r}: {exc}") from exc
