"""Indexed-color BMP: 1/4/8-bit palette layouts and RLE4/RLE8
compression — the classic Windows bitmap shapes beyond the 24-bit
truecolor path in operators/multimodal.py (icons, screenshots, legacy
assets).

Layout notes (all public BMP spec):
- BITMAPINFOHEADER with biBitCount in {1, 4, 8}; the color table
  follows the header as BGRA quads; biClrUsed counts the entries (0
  means the full 2^bpp).
- Uncompressed rows pack pixels MSB-first within each byte (sub-byte
  depths) and pad to 4-byte boundaries; positive height = bottom-up,
  negative = top-down (uncompressed only — RLE is always bottom-up).
- RLE8 (biCompression=1) / RLE4 (biCompression=2) streams are pairs:
  count>0 = encoded run (RLE4 alternates the two nibbles of the value
  byte); count=0 escapes: 0=end-of-line, 1=end-of-bitmap, 2=delta
  (dx,dy skip, skipped pixels read as 0 here — the spec leaves them
  undefined), >=3 absolute mode (pixels follow, word-aligned).

The 24-bit path (decode_bmp/encode_bmp) stays untouched and pinned by
its standing tests. The reference engine has no image codecs (stream
transport only, src/river/river.pyx) — this is the training-data
multimodal family (SURVEY.md). Spark-side the payloads live inside
Arrow-batched ``mapInPandas`` and never shuffle; malformed payloads
raise ValueError/struct.error (corruption-fuzzed), and pixel output
allocation is bounded by the header dims AFTER a 2^26-pixel cap.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAX_PIXELS = 1 << 26


def _pack_row(row: "np.ndarray", bpp: int) -> bytes:
    """Pack one row of indices MSB-first at bpp bits, 4-byte padded."""
    w = row.size
    if bpp == 8:
        raw = row.astype(np.uint8).tobytes()
    elif bpp == 4:
        padded = np.zeros((w + 1) // 2 * 2, np.uint8)
        padded[:w] = row
        raw = ((padded[0::2] << 4) | padded[1::2]).astype(np.uint8).tobytes()
    elif bpp == 1:
        padded = np.zeros((w + 7) // 8 * 8, np.uint8)
        padded[:w] = row
        raw = np.packbits(padded).tobytes()
    else:
        raise ValueError(f"unsupported indexed bpp {bpp}")
    pad = (-len(raw)) % 4
    return raw + b"\x00" * pad


def _rle8_row(row: "np.ndarray") -> bytes:
    """RLE8-encode one row: encoded mode for runs >= 2, absolute mode
    for literal stretches >= 3, single strays as 1-runs."""
    out = bytearray()
    i, w = 0, row.size
    while i < w:
        run = 1
        while i + run < w and run < 255 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out += bytes([run, int(row[i])])
            i += run
            continue
        # literal stretch: advance while no 2-run starts
        j = i
        while j < w and (j - i) < 255:
            if j + 1 < w and row[j + 1] == row[j]:
                break
            j += 1
        n = j - i
        if n >= 3:
            out += bytes([0, n]) + row[i:j].astype(np.uint8).tobytes()
            if n & 1:
                out += b"\x00"
        else:
            for k in range(i, j):
                out += bytes([1, int(row[k])])
        i = j
    return bytes(out)


def _rle4_row(row: "np.ndarray") -> bytes:
    """RLE4-encode one row: encoded runs alternate the value byte's two
    nibbles; absolute stretches >= 4 pack nibbles word-aligned."""
    out = bytearray()
    i, w = 0, row.size
    while i < w:
        a = int(row[i])
        b = int(row[i + 1]) if i + 1 < w else a
        run = 0
        while i + run < w and run < 255 and int(row[i + run]) == (a, b)[run & 1]:
            run += 1
        if run >= 2:
            out += bytes([run, (a << 4) | b])
            i += run
            continue
        j = i
        while j < w and (j - i) < 255:
            if j + 2 < w and row[j + 1] == row[j + 2] == row[j]:
                break
            j += 1
        n = j - i
        if n >= 4:
            nib = row[i:j].astype(np.uint8)
            padded = np.zeros((n + 1) // 2 * 2, np.uint8)
            padded[:n] = nib
            packed = ((padded[0::2] << 4) | padded[1::2]).tobytes()
            out += bytes([0, n]) + packed
            if len(packed) & 1:
                out += b"\x00"
        else:
            for k in range(i, j):
                out += bytes([1, int(row[k]) << 4])
        i = j
    return bytes(out)


def encode_bmp_indexed(
    width: int,
    height: int,
    indices: "np.ndarray",
    palette: "np.ndarray",
    bpp: int = 8,
    compression: int = 0,
    top_down: bool = False,
) -> bytes:
    """Encode an HxW index array + (N,3) RGB palette as an indexed BMP.

    ``compression``: 0 (packed rows), 1 (RLE8, bpp must be 8), 2
    (RLE4, bpp must be 4). RLE and top-down are mutually exclusive
    (the spec's RLE streams are bottom-up only).
    """
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.shape != (height, width):
        raise ValueError("indices must be HxW")
    if pal.ndim != 2 or pal.shape[1] != 3 or not (1 <= pal.shape[0] <= 1 << bpp):
        raise ValueError("palette must be (N,3) with N <= 2^bpp")
    if int(idx.max(initial=0)) >= pal.shape[0]:
        raise ValueError("index outside the palette")
    if compression == 1 and bpp != 8:
        raise ValueError("RLE8 requires bpp=8")
    if compression == 2 and bpp != 4:
        raise ValueError("RLE4 requires bpp=4")
    if compression and top_down:
        raise ValueError("RLE BMPs are bottom-up only")

    if compression == 0:
        order = range(height) if top_down else range(height - 1, -1, -1)
        pix = b"".join(_pack_row(idx[r], bpp) for r in order)
    else:
        enc = _rle8_row if compression == 1 else _rle4_row
        body = bytearray()
        for r in range(height - 1, -1, -1):
            body += enc(idx[r])
            body += b"\x00\x00"  # end of line
        body += b"\x00\x01"  # end of bitmap
        pix = bytes(body)

    quads = np.zeros((pal.shape[0], 4), np.uint8)
    quads[:, 0], quads[:, 1], quads[:, 2] = pal[:, 2], pal[:, 1], pal[:, 0]
    table = quads.tobytes()
    offset = 14 + 40 + len(table)
    hdr = (
        b"BM"
        + struct.pack("<IHHI", offset + len(pix), 0, 0, offset)
        + struct.pack(
            "<IiiHHIIiiII",
            40, width, -height if top_down else height, 1, bpp,
            compression, len(pix), 0, 0, pal.shape[0], 0,
        )
    )
    return hdr + table + pix


def _decode_rle(data: bytes, width: int, height: int, rle4: bool) -> "np.ndarray":
    """Decode an RLE4/RLE8 stream into a bottom-up HxW index array
    (row 0 of the output = TOP row, i.e. already flipped)."""
    out = np.zeros((height, width), np.uint8)  # skipped/undefined = 0
    x, y = 0, 0  # y counts from the BOTTOM row
    pos, n = 0, len(data)
    while True:
        if pos + 2 > n:
            raise ValueError("RLE stream ends without end-of-bitmap")
        count, val = data[pos], data[pos + 1]
        pos += 2
        if count > 0:  # encoded run
            if y >= height or x + count > width:
                raise ValueError("RLE run overflows the row")
            row = out[height - 1 - y]
            if rle4:
                hi, lo = val >> 4, val & 0x0F
                for k in range(count):
                    row[x + k] = hi if (k & 1) == 0 else lo
            else:
                row[x : x + count] = val
            x += count
            continue
        if val == 0:  # end of line
            x, y = 0, y + 1
            continue
        if val == 1:  # end of bitmap
            return out
        if val == 2:  # delta
            if pos + 2 > n:
                raise ValueError("truncated RLE delta")
            dx, dy = data[pos], data[pos + 1]
            pos += 2
            x, y = x + dx, y + dy
            if x > width or y > height:
                raise ValueError("RLE delta outside the bitmap")
            continue
        # absolute mode: val pixels follow
        if y >= height or x + val > width:
            raise ValueError("RLE absolute run overflows the row")
        if rle4:
            nbytes = (val + 1) // 2
            if pos + nbytes > n:
                raise ValueError("truncated RLE absolute block")
            b = np.frombuffer(data, np.uint8, nbytes, pos)
            nib = np.empty(nbytes * 2, np.uint8)
            nib[0::2], nib[1::2] = b >> 4, b & 0x0F
            out[height - 1 - y, x : x + val] = nib[:val]
            pos += nbytes + (nbytes & 1)
        else:
            if pos + val > n:
                raise ValueError("truncated RLE absolute block")
            out[height - 1 - y, x : x + val] = np.frombuffer(
                data, np.uint8, val, pos
            )
            pos += val + (val & 1)
        x += val


def decode_bmp_indexed(payload: bytes):
    """Decode a 1/4/8-bit indexed BMP (uncompressed, RLE8, or RLE4).

    Returns ``(width, height, bpp, compression, HxW uint8 index array
    top-down, (N,3) uint8 RGB palette)``. Raises ValueError on
    truncation, bad depths, palette/bound defects, or RLE stream
    violations.
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    clr_used = struct.unpack_from("<I", payload, 46)[0]
    if planes != 1 or bpp not in (1, 4, 8):
        raise ValueError(f"unsupported indexed BMP (bpp={bpp})")
    if compression not in (0, 1, 2):
        raise ValueError(f"unsupported BMP compression {compression}")
    if compression == 1 and bpp != 8 or compression == 2 and bpp != 4:
        raise ValueError(f"compression {compression} invalid for bpp {bpp}")
    top_down = height < 0
    if compression and top_down:
        raise ValueError("RLE BMPs are bottom-up only")
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError("degenerate BMP dimensions")
    if width * height > _MAX_PIXELS:
        raise ValueError("bitmap exceeds the allocation bound")
    n_colors = clr_used or (1 << bpp)
    if n_colors > 1 << bpp:
        raise ValueError("color table larger than the depth allows")
    table_at = 14 + hdr_size
    if table_at + 4 * n_colors > len(payload):
        raise ValueError("truncated color table")
    quads = np.frombuffer(payload, np.uint8, 4 * n_colors, table_at).reshape(-1, 4)
    palette = quads[:, [2, 1, 0]].copy()  # BGRA -> RGB

    if compression == 0:
        row_bytes = (width * bpp + 7) // 8
        row_size = (row_bytes + 3) // 4 * 4
        if data_offset + row_size * height > len(payload):
            raise ValueError("truncated BMP pixel data")
        rows = np.frombuffer(
            payload, np.uint8, row_size * height, data_offset
        ).reshape(height, row_size)[:, :row_bytes]
        if bpp == 8:
            idx = rows[:, :width].copy()
        elif bpp == 4:
            nib = np.empty((height, row_bytes * 2), np.uint8)
            nib[:, 0::2], nib[:, 1::2] = rows >> 4, rows & 0x0F
            idx = nib[:, :width].copy()
        else:
            bits = np.unpackbits(rows, axis=1)
            idx = bits[:, :width].copy()
        if not top_down:
            idx = idx[::-1].copy()
    else:
        idx = _decode_rle(payload[data_offset:], width, height, rle4=(bpp == 4))
    if int(idx.max(initial=0)) >= n_colors:
        raise ValueError("pixel index outside the color table")
    return width, height, bpp, compression, idx, palette


_BMP_IDX_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("bpp", T.IntegerType()),
        T.StructField("compression", T.IntegerType()),
        T.StructField("n_colors", T.IntegerType()),
        T.StructField("idx_sum", T.LongType()),
        T.StructField("pos_weighted_sum", T.LongType()),
        T.StructField("pal_r_sum", T.LongType()),
    ]
)


def decode_bmp_indexed_stats(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """REAL indexed-BMP decode emitting exact integer statistics over
    the TOP-DOWN row-major order: index sum, position-weighted checksum
    (pins bit-unpack order, bottom-up flip, and RLE reassembly), and
    the palette-mapped red sum (pins the BGRA quad parse + biClrUsed).
    Malformed payloads become ok=False rows."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))
    cols = [f.name for f in _BMP_IDX_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    w, h, bpp, comp, idx, pal = decode_bmp_indexed(
                        bytes(payload) if payload else b""
                    )
                except (ValueError, OverflowError, struct.error):
                    for k, v in (
                        ("ok", False), ("width", 0), ("height", 0), ("bpp", 0),
                        ("compression", 0), ("n_colors", 0), ("idx_sum", 0),
                        ("pos_weighted_sum", 0), ("pal_r_sum", 0),
                    ):
                        out[k].append(v)
                    continue
                flat = idx.reshape(-1).astype(np.int64)
                p = np.arange(flat.size, dtype=np.int64)
                out["ok"].append(True)
                out["width"].append(w)
                out["height"].append(h)
                out["bpp"].append(bpp)
                out["compression"].append(comp)
                out["n_colors"].append(int(pal.shape[0]))
                out["idx_sum"].append(int(flat.sum()))
                out["pos_weighted_sum"].append(int(((p % 997 + 1) * flat).sum()))
                out["pal_r_sum"].append(int(pal[flat, 0].astype(np.int64).sum()))
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=_BMP_IDX_SCHEMA)
