"""Baseline TIFF 6.0 with PackBits compression, pure numpy + struct.

Continues the live-codec family (operators/multimodal.py: BMP, WAV,
PNG, QOI, GIF; operators/jpeg.py: baseline JPEG). TIFF brings the two
container mechanics none of the others have — a tag-directory (IFD)
walk with inline-vs-offset value resolution, and multi-strip image
assembly — plus the PackBits RLE entropy layer (TIFF 6.0 §9). PackBits
is LOSSLESS, so decode(encode(x)) == x exactly and the driver oracle
(mm_tiff_decode_stats) recomputes pixel statistics straight from the
generation rule without seeing the bytes, GIF-style.

Supported baseline subset: both byte orders (II / MM) on decode,
8-bit grayscale or RGB (SamplesPerPixel 1 or 3, chunky), Compression
1 (none) or 32773 (PackBits), arbitrary RowsPerStrip with a partial
final strip. The encoder writes little-endian grayscale/RGB with
whole-strip PackBits streams.

Reference scope parity: the reference stores opaque binary payloads
(docs treat payloads as bytes); decode here is a first-class
distributed operator per SURVEY.md's multimodal mandate.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_tiff", "decode_tiff", "packbits_encode", "packbits_decode"]


# ---------------------------------------------------------------------------
# PackBits (TIFF 6.0 section 9)
# ---------------------------------------------------------------------------

def packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: runs of >=2 become (257-n, byte); literals are
    grouped up to 128. The -128 noop header is never emitted."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # measure the run starting at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i = j
            continue
        # literal stretch: until the next run of >=3 (a 2-run inside a
        # literal is cheaper left literal) or 128 bytes
        lit = i
        while j < n and j - lit < 128:
            k = j + 1
            while k < n and data[k] == data[j]:
                k += 1
            if k - j >= 3:
                break
            j = k
        j = min(j, lit + 128, n)
        out.append(j - lit - 1)
        out.extend(data[lit:j])
        i = j
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expected:
        if i >= len(data):
            raise ValueError("PackBits underrun")
        h = data[i]
        i += 1
        if h == 128:  # noop
            continue
        if h < 128:  # h+1 literal bytes
            if i + h + 1 > len(data):
                raise ValueError("PackBits literal past end")
            out.extend(data[i : i + h + 1])
            i += h + 1
        else:  # repeat next byte 257-h times
            if i >= len(data):
                raise ValueError("PackBits run past end")
            out.extend(bytes([data[i]]) * (257 - h))
            i += 1
    if len(out) != expected:
        raise ValueError("PackBits overrun")
    return bytes(out)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

_T_WIDTH, _T_LENGTH, _T_BPS, _T_COMP = 256, 257, 258, 259
_T_PHOTO, _T_STRIP_OFF, _T_SPP, _T_RPS, _T_STRIP_CNT = 262, 273, 277, 278, 279


def encode_tiff(
    img: np.ndarray,
    rows_per_strip: int = 4,
    compression: int = 32773,
) -> bytes:
    """Encode HxW (grayscale) or HxWx3 (RGB) uint8 as little-endian
    baseline TIFF. compression: 1 = none, 32773 = PackBits."""
    if img.ndim == 2:
        spp, photo = 1, 1
        h, w = img.shape
        raw = img
    elif img.ndim == 3 and img.shape[2] == 3:
        spp, photo = 3, 2
        h, w = img.shape[:2]
        raw = img
    else:
        raise ValueError("HxW or HxWx3 uint8")
    if compression not in (1, 32773):
        raise ValueError("compression must be 1 or 32773")

    strips = []
    for y0 in range(0, h, rows_per_strip):
        chunk = raw[y0 : y0 + rows_per_strip].tobytes()
        strips.append(packbits_encode(chunk) if compression == 32773 else chunk)

    out = bytearray(b"II*\x00")
    out += b"\x00\x00\x00\x00"  # IFD offset patched below
    offsets = []
    for s in strips:
        offsets.append(len(out))
        out += s
    if len(out) % 2:
        out += b"\x00"  # IFDs must be word-aligned
    ifd_off = len(out)
    struct.pack_into("<I", out, 4, ifd_off)

    n_strips = len(strips)
    # value arrays that don't fit inline go after the IFD
    entries = []  # (tag, type, count, packed-value-or-None, data)
    tail = bytearray()
    tail_base = ifd_off + 2 + 12 * 9 + 4

    def add(tag, typ, count, values):
        size = {3: 2, 4: 4}[typ] * count
        fmt = "<" + ("H" if typ == 3 else "I") * count
        packed = struct.pack(fmt, *values)
        if size <= 4:
            entries.append((tag, typ, count, packed.ljust(4, b"\x00")))
        else:
            off = tail_base + len(tail)
            tail.extend(packed)
            entries.append((tag, typ, count, struct.pack("<I", off)))

    add(_T_WIDTH, 4, 1, [w])
    add(_T_LENGTH, 4, 1, [h])
    add(_T_BPS, 3, spp, [8] * spp)
    add(_T_COMP, 3, 1, [compression])
    add(_T_PHOTO, 3, 1, [photo])
    add(_T_STRIP_OFF, 4, n_strips, offsets)
    add(_T_SPP, 3, 1, [spp])
    add(_T_RPS, 4, 1, [rows_per_strip])
    add(_T_STRIP_CNT, 4, n_strips, [len(s) for s in strips])
    assert len(entries) == 9
    entries.sort()  # TIFF requires ascending tag order

    out += struct.pack("<H", len(entries))
    for tag, typ, count, val in entries:
        out += struct.pack("<HHI", tag, typ, count) + val
    out += b"\x00\x00\x00\x00"  # no next IFD
    out += tail
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_tiff(payload: bytes):
    """Decode the supported baseline subset (module docstring). Returns
    (width, height, pixels) with pixels HxW (grayscale) or HxWx3 (RGB)
    uint8. Raises ValueError outside the subset."""
    if len(payload) < 8:
        raise ValueError("short TIFF")
    if payload[:2] == b"II":
        e = "<"
    elif payload[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("bad TIFF byte order")
    (magic,) = struct.unpack_from(e + "H", payload, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (ifd_off,) = struct.unpack_from(e + "I", payload, 4)

    try:
        (n_ent,) = struct.unpack_from(e + "H", payload, ifd_off)
    except struct.error as exc:
        raise ValueError("truncated IFD") from exc
    if ifd_off + 2 + 12 * n_ent + 4 > len(payload):
        raise ValueError("truncated IFD")
    tags: dict[int, list[int]] = {}
    for i in range(n_ent):
        o = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(e + "HHI", payload, o)
        if typ == 3:
            unit, fmt = 2, "H"
        elif typ == 4:
            unit, fmt = 4, "I"
        elif typ in (1, 2, 5, 12):  # BYTE/ASCII/RATIONAL/...: not needed
            continue
        else:
            continue
        size = unit * count
        src = o + 8 if size <= 4 else struct.unpack_from(e + "I", payload, o + 8)[0]
        try:
            tags[tag] = list(struct.unpack_from(e + fmt * count, payload, src))
        except struct.error as exc:
            raise ValueError("tag value past end of file") from exc

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"missing required tag {tag}")
            return default
        return v[0]

    w, h = one(_T_WIDTH), one(_T_LENGTH)
    spp = one(_T_SPP, 1)
    comp = one(_T_COMP, 1)
    if spp not in (1, 3):
        raise ValueError("SamplesPerPixel must be 1 or 3")
    if any(b != 8 for b in tags.get(_T_BPS, [8] * spp)):
        raise ValueError("only 8 bits per sample")
    if comp not in (1, 32773):
        raise ValueError("unsupported compression")
    rps = one(_T_RPS, h)
    offs = tags.get(_T_STRIP_OFF)
    cnts = tags.get(_T_STRIP_CNT)
    if not offs or not cnts or len(offs) != len(cnts):
        raise ValueError("bad strip layout")

    row_bytes = w * spp
    raw = bytearray()
    for si, (o, c) in enumerate(zip(offs, cnts)):
        n_rows = min(rps, h - si * rps)
        if n_rows <= 0:
            raise ValueError("more strips than rows")
        expected = n_rows * row_bytes
        chunk = payload[o : o + c]
        if len(chunk) != c:
            raise ValueError("strip past end of file")
        if comp == 32773:
            raw.extend(packbits_decode(chunk, expected))
        else:
            if len(chunk) != expected:
                raise ValueError("uncompressed strip size mismatch")
            raw.extend(chunk)
    if len(raw) != h * row_bytes:
        raise ValueError("assembled size mismatch")
    arr = np.frombuffer(bytes(raw), dtype=np.uint8)
    return w, h, arr.reshape((h, w) if spp == 1 else (h, w, 3))


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

def decode_tiff_pixel_stats(df, id_col: str, bin_col: str):
    """REAL TIFF decode emitting EXACT integer pixel statistics (the
    bit-level-oracle shape shared by the codec family): IFD tag walk,
    strip reassembly, PackBits expansion, then BIGINT sums a SQL
    oracle recomputes from the generation rule. Malformed payloads
    yield ok=false rows. One Arrow-batched mapInPandas pass; payloads
    never shuffle."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ok", T.BooleanType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_pixels", T.LongType()),
            T.StructField("pix_sum", T.LongType()),
            T.StructField("pos_weighted_sum", T.LongType()),
            T.StructField("n_bright", T.LongType()),
        ]
    )
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

    def decode(batches):
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "ok", "width", "height",
                                   "n_pixels", "pix_sum", "pos_weighted_sum",
                                   "n_bright")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    w, h, px = decode_tiff(bytes(payload or b""))
                    if px.ndim != 2:
                        raise ValueError("stats path expects grayscale")
                except (ValueError, IndexError, struct.error):
                    for k, v in (("ok", False), ("width", 0), ("height", 0),
                                 ("n_pixels", 0), ("pix_sum", 0),
                                 ("pos_weighted_sum", 0), ("n_bright", 0)):
                        out[k].append(v)
                    continue
                flat = px.reshape(-1).astype(np.int64)
                p = np.arange(flat.size, dtype=np.int64)
                out["ok"].append(True)
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(int(flat.size))
                out["pix_sum"].append(int(flat.sum()))
                out["pos_weighted_sum"].append(int(((p % 997 + 1) * flat).sum()))
                out["n_bright"].append(int((flat > 127).sum()))
            yield pd.DataFrame(out)

    return src.mapInPandas(decode, schema=schema)
