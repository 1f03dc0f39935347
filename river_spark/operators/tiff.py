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
8-bit or 16-bit (round 15) grayscale or RGB (SamplesPerPixel 1 or 3,
chunky; 16-bit samples in file byte order, predictor differencing on
sample VALUES per §14), Compression 1 (none), 5 (LZW — round 13:
MSB-first, EarlyChange=1, ClearCode restarts, TIFF 6.0 §13), 8 /
32946 (Deflate — round 15: zlib streams per strip/tile with bounded
inflate) or 32773 (PackBits), Predictor 1 or 2
(horizontal differencing, §14 — the pairing real scanned/archival
TIFFs ship), arbitrary RowsPerStrip with a partial final strip, and —
round 14 — the §15 TILED layout (TileWidth/TileLength multiples of 16,
TileOffsets/TileByteCounts, zero-padded partial edge tiles cropped on
reassembly) over the same entropy layer. The encoder writes
little-endian grayscale/RGB with whole-strip or whole-tile streams.

Reference scope parity: the reference stores opaque binary payloads
(docs treat payloads as bytes); decode here is a first-class
distributed operator per SURVEY.md's multimodal mandate.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["encode_tiff", "decode_tiff", "packbits_encode", "packbits_decode",
           "lzw_encode", "lzw_decode"]


# ---------------------------------------------------------------------------
# LZW (TIFF 6.0 section 13) — MSB-first bit packing, EarlyChange=1
# ---------------------------------------------------------------------------

_LZW_CLEAR, _LZW_EOI = 256, 257


def lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW: MSB-first code packing, 9->12 bit widths with
    the EARLY code-width change (the width grows when the NEXT code to
    be assigned reaches 2^bits - 1 — TIFF's off-by-one relative to GIF),
    ClearCode restart when the table nears 4096."""
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, bits = 258, 9
    put(_LZW_CLEAR, bits)
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        put(table[w], bits)
        table[w + c] = next_code
        next_code += 1
        if next_code == (1 << bits) - 1 and bits < 12:  # early change
            bits += 1
        elif next_code >= 4094:  # table nearly full: restart
            put(_LZW_CLEAR, bits)
            table = {bytes([i]): i for i in range(256)}
            next_code, bits = 258, 9
        w = c
    if w:
        put(table[w], bits)
        # width bump the DECODER will apply after consuming this code
        next_code += 1
        if next_code == (1 << bits) - 1 and bits < 12:
            bits += 1
    put(_LZW_EOI, bits)
    if nbits:
        put(0, 8 - nbits)
    return bytes(out)


def lzw_decode(data: bytes, expected: int) -> bytes:
    """Inverse of :func:`lzw_encode`; also accepts foreign streams with
    different clear cadence. Raises ValueError on malformed codes."""
    out = bytearray()
    pos = acc = nbits = 0

    def get(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW bitstream underrun")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        v = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1
        return v

    table: list[bytes] = []
    bits = 9
    prev: bytes | None = None
    while len(out) < expected:
        code = get(bits)
        if code == _LZW_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            bits = 9
            prev = None
            continue
        if code == _LZW_EOI:
            break
        if prev is None:
            if not table or code >= 256:
                raise ValueError("LZW data before ClearCode")
            prev = table[code]
            out.extend(prev)
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("LZW code past table end")
        out.extend(entry)
        if len(table) < 4096:
            table.append(prev + entry[:1])
        # EARLY width change, stated from the decoder's lagged table
        # (one entry behind the encoder): the encoder grows its width
        # once the next code to assign reaches 2^bits - 1, which is the
        # moment this table holds 2^bits - 2 entries
        if len(table) == (1 << bits) - 2 and bits < 12:
            bits += 1
        prev = entry
    if len(out) != expected:
        raise ValueError(f"LZW expanded {len(out)} of {expected} bytes")
    return bytes(out)


# ---------------------------------------------------------------------------
# horizontal differencing predictor (TIFF 6.0 section 14, Predictor=2)
# ---------------------------------------------------------------------------

def _predict_rows(chunk: bytes, row_bytes: int, spp: int,
                  dtype="u1") -> bytes:
    """Forward predictor: per row, each SAMPLE becomes the difference
    from the sample one pixel left (same channel), modulo the sample
    range — §14 differencing operates on sample VALUES, so 16-bit
    samples difference as 16-bit units in file byte order, not as raw
    bytes."""
    dt = np.dtype(dtype)
    mod = 1 << (8 * dt.itemsize)
    n = row_bytes // dt.itemsize
    a = np.frombuffer(chunk, dtype=dt).reshape(-1, n).astype(np.int64)
    d = a.copy()
    d[:, spp:] = (a[:, spp:] - a[:, :-spp]) % mod
    return d.astype(dt).tobytes()


def _unpredict_rows(chunk: bytes, row_bytes: int, spp: int,
                    dtype="u1") -> bytes:
    """Inverse predictor: per-row cumulative sum per channel, modulo
    the sample range, in the sample unit of ``dtype``."""
    dt = np.dtype(dtype)
    mod = 1 << (8 * dt.itemsize)
    n = row_bytes // dt.itemsize
    a = np.frombuffer(chunk, dtype=dt).reshape(-1, n)
    h = a.shape[0]
    w = n // spp
    per = a.reshape(h, w, spp).astype(np.int64)
    per = np.cumsum(per, axis=1) % mod
    return per.astype(dt).reshape(h, n).tobytes()


def _inflate(chunk: bytes, expected: int) -> bytes:
    """Bounded zlib inflate for Deflate strips/tiles (compression 8 /
    32946): output is capped at ``expected`` bytes BEFORE allocation,
    and both short and over-long streams reject."""
    d = zlib.decompressobj()
    try:
        out = d.decompress(chunk, expected)
    except zlib.error as exc:
        raise ValueError("bad deflate stream") from exc
    if len(out) != expected or d.unconsumed_tail:
        raise ValueError("deflate output size mismatch")
    return out


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
_T_PREDICTOR = 317
_T_COLORMAP = 320
_T_TILE_W, _T_TILE_L, _T_TILE_OFF, _T_TILE_CNT = 322, 323, 324, 325


def encode_tiff(
    img: np.ndarray,
    rows_per_strip: int = 4,
    compression: int = 32773,
    predictor: int = 1,
    tile_size: tuple | None = None,
    colormap: np.ndarray | None = None,
) -> bytes:
    """Encode HxW (grayscale) or HxWx3 (RGB) uint8 as little-endian
    baseline TIFF. compression: 1 = none, 5 = LZW, 32773 = PackBits;
    predictor: 1 = none, 2 = horizontal differencing (round 13 — the
    pairing real scanned/archival TIFFs ship: Predictor 2 turns smooth
    gradients into near-constant residue LZW then collapses).
    ``tile_size=(tw, tl)`` switches to the TIFF 6.0 §15 tiled layout
    (round 14 — scanned/archival and geo TIFFs): both dimensions must
    be multiples of 16 per the spec, edge tiles are zero-padded to the
    full tile size (every tile decompresses to exactly tw*tl*spp
    bytes), and the predictor differences within each tile's rows."""
    if img.ndim == 2:
        spp, photo = 1, 1
        h, w = img.shape
        raw = img
    elif img.ndim == 3 and img.shape[2] == 3:
        spp, photo = 3, 2
        h, w = img.shape[:2]
        raw = img
    else:
        raise ValueError("HxW or HxWx3")
    if colormap is not None:
        # photometric 3: img is an HxW uint8 index plane; the ColorMap
        # holds 16-bit R..G..B planes of 2^bps entries (TIFF 6.0 §5)
        if img.ndim != 2 or img.dtype != np.uint8:
            raise ValueError("palette images are HxW uint8 indices")
        colormap = np.asarray(colormap, dtype=np.uint16)
        if colormap.shape != (256, 3):
            raise ValueError("colormap must be (256, 3) uint16")
        photo = 3
    if img.dtype == np.uint8:
        bps, sdt = 8, "u1"
    elif img.dtype == np.uint16:
        bps, sdt = 16, "<u2"   # file is written little-endian
    else:
        raise ValueError("uint8 or uint16 samples")
    unit = bps // 8
    raw = raw.astype(sdt)
    if compression not in (1, 5, 8, 32773):
        raise ValueError("compression must be 1, 5 (LZW), 8 (Deflate) or 32773")
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 or 2")

    def entropy(chunk: bytes, row_bytes: int) -> bytes:
        if predictor == 2:
            chunk = _predict_rows(chunk, row_bytes, spp, sdt)
        if compression == 32773:
            return packbits_encode(chunk)
        if compression == 5:
            return lzw_encode(chunk)
        if compression == 8:
            return zlib.compress(chunk)
        return chunk

    strips = []
    if tile_size is not None:
        tw, tl = tile_size
        if tw % 16 or tl % 16 or tw <= 0 or tl <= 0:
            raise ValueError("tile dimensions must be positive multiples of 16")
        full = np.zeros(
            (-(-h // tl) * tl, -(-w // tw) * tw) + ((3,) if spp == 3 else ()),
            dtype=sdt,
        )
        full[:h, :w] = raw                     # edge tiles zero-padded
        for y0 in range(0, full.shape[0], tl):      # left-to-right, then down
            for x0 in range(0, full.shape[1], tw):
                strips.append(entropy(
                    full[y0 : y0 + tl, x0 : x0 + tw].tobytes(),
                    tw * spp * unit))
    else:
        for y0 in range(0, h, rows_per_strip):
            strips.append(entropy(
                raw[y0 : y0 + rows_per_strip].tobytes(), w * spp * unit))

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
    n_entries = ((10 if tile_size is not None else 9) + (predictor == 2)
                 + (colormap is not None))
    tail_base = ifd_off + 2 + 12 * n_entries + 4

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
    add(_T_BPS, 3, spp, [bps] * spp)
    add(_T_COMP, 3, 1, [compression])
    add(_T_PHOTO, 3, 1, [photo])
    add(_T_SPP, 3, 1, [spp])
    if tile_size is not None:
        add(_T_TILE_W, 4, 1, [tile_size[0]])
        add(_T_TILE_L, 4, 1, [tile_size[1]])
        add(_T_TILE_OFF, 4, n_strips, offsets)
        add(_T_TILE_CNT, 4, n_strips, [len(s) for s in strips])
    else:
        add(_T_STRIP_OFF, 4, n_strips, offsets)
        add(_T_RPS, 4, 1, [rows_per_strip])
        add(_T_STRIP_CNT, 4, n_strips, [len(s) for s in strips])
    if predictor == 2:
        add(_T_PREDICTOR, 3, 1, [2])
    if colormap is not None:
        add(_T_COLORMAP, 3, 768,
            list(colormap[:, 0]) + list(colormap[:, 1]) + list(colormap[:, 2]))
    assert len(entries) == n_entries
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
        # bound BEFORE building the unpack format: a corrupted count
        # (e.g. 2^30) would otherwise allocate a gigabyte format string
        # and hang the executor before any struct.error could fire
        if size > len(payload):
            raise ValueError("tag value larger than the file")
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
    photo = one(_T_PHOTO, 1)
    cmap = None
    if photo == 3:
        cm = tags.get(_T_COLORMAP)
        if spp != 1:
            raise ValueError("palette images are single-sample")
        if not cm or len(cm) != 768:
            raise ValueError("palette image needs a 768-entry ColorMap")
        cmap = np.asarray(cm, dtype=np.uint16).reshape(3, 256).T
    if spp not in (1, 3):
        raise ValueError("SamplesPerPixel must be 1 or 3")
    bps_list = tags.get(_T_BPS, [8] * spp)
    if all(b == 8 for b in bps_list):
        bps = 8
    elif all(b == 16 for b in bps_list):
        bps = 16
    else:
        raise ValueError("only uniform 8 or 16 bits per sample")
    unit = bps // 8
    sdt = "u1" if bps == 8 else e + "u2"   # samples in file byte order
    if comp not in (1, 5, 8, 32946, 32773):
        raise ValueError("unsupported compression")
    predictor = one(_T_PREDICTOR, 1)
    if predictor not in (1, 2):
        raise ValueError("unsupported predictor")
    if _T_TILE_W in tags or _T_TILE_L in tags:
        if _T_STRIP_OFF in tags:
            raise ValueError("both tile and strip layout tags present")
        tw, tl = one(_T_TILE_W), one(_T_TILE_L)
        if tw <= 0 or tl <= 0 or tw % 16 or tl % 16:
            raise ValueError("tile dimensions must be positive multiples of 16")
        offs = tags.get(_T_TILE_OFF)
        cnts = tags.get(_T_TILE_CNT)
        if not offs or not cnts or len(offs) != len(cnts):
            raise ValueError("bad tile layout")
        across, down = -(-w // tw), -(-h // tl)
        if len(offs) != across * down:
            raise ValueError("tile count does not match the image grid")
        # the grid is allocated from HEADER values before any tile is
        # validated — bound it so a lying TileWidth/TileLength lands as
        # a reject, not an allocation failure the stats ops can't catch
        if down * tl * across * tw * spp * unit > (1 << 28):
            raise ValueError("tile grid implausibly large")
        row_bytes = tw * spp * unit
        expected = tl * row_bytes            # every tile is full-size
        shape = (down * tl, across * tw) + ((3,) if spp == 3 else ())
        img = np.zeros(shape, dtype=np.uint8 if bps == 8 else np.uint16)
        for ti, (o, c) in enumerate(zip(offs, cnts)):
            chunk = payload[o : o + c]
            if len(chunk) != c:
                raise ValueError("tile past end of file")
            if comp == 32773:
                chunk = packbits_decode(chunk, expected)
            elif comp == 5:
                chunk = lzw_decode(chunk, expected)
            elif comp in (8, 32946):
                chunk = _inflate(chunk, expected)
            elif len(chunk) != expected:
                raise ValueError("uncompressed tile size mismatch")
            if predictor == 2:
                chunk = _unpredict_rows(chunk, row_bytes, spp, sdt)
            tile = np.frombuffer(chunk, dtype=sdt).reshape(
                (tl, tw) if spp == 1 else (tl, tw, 3))
            y0 = (ti // across) * tl
            x0 = (ti % across) * tw
            img[y0 : y0 + tl, x0 : x0 + tw] = tile
        out_img = np.ascontiguousarray(img[:h, :w])  # crop edge padding
        if cmap is not None:
            if int(out_img.max(initial=0)) > 255:
                raise ValueError("palette index outside the ColorMap")
            out_img = cmap[out_img]
        return w, h, out_img

    rps = one(_T_RPS, h)
    offs = tags.get(_T_STRIP_OFF)
    cnts = tags.get(_T_STRIP_CNT)
    if not offs or not cnts or len(offs) != len(cnts):
        raise ValueError("bad strip layout")

    row_bytes = w * spp * unit
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
            chunk = packbits_decode(chunk, expected)
        elif comp == 5:
            chunk = lzw_decode(chunk, expected)
        elif comp in (8, 32946):
            chunk = _inflate(chunk, expected)
        elif len(chunk) != expected:
            raise ValueError("uncompressed strip size mismatch")
        if predictor == 2:
            chunk = _unpredict_rows(chunk, row_bytes, spp, sdt)
        raw.extend(chunk)
    if len(raw) != h * row_bytes:
        raise ValueError("assembled size mismatch")
    arr = np.frombuffer(bytes(raw), dtype=sdt)
    out_img = arr.reshape((h, w) if spp == 1 else (h, w, 3))
    if cmap is not None:
        if int(out_img.max(initial=0)) > 255:
            raise ValueError("palette index outside the ColorMap")
        out_img = cmap[out_img]
    return w, h, out_img


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
                except (ValueError, IndexError, OverflowError, struct.error):
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


def decode_tiff_rgb_stats(df, id_col: str, bin_col: str):
    """REAL RGB TIFF decode emitting EXACT integer per-channel sums plus
    a position-weighted red checksum — the color sibling of
    decode_tiff_pixel_stats, added with the round-13 LZW + Predictor-2
    subset widening. Malformed or grayscale payloads yield ok=false
    rows. One Arrow-batched mapInPandas pass; payloads never shuffle."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cols = ("doc_id", "ok", "width", "height",
            "r_sum", "g_sum", "b_sum", "pos_weighted_r")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ok", T.BooleanType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("r_sum", T.LongType()),
            T.StructField("g_sum", T.LongType()),
            T.StructField("b_sum", T.LongType()),
            T.StructField("pos_weighted_r", T.LongType()),
        ]
    )
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

    def decode(batches):
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    w, h, px = decode_tiff(bytes(payload or b""))
                    if px.ndim != 3:
                        raise ValueError("stats path expects RGB")
                except (ValueError, IndexError, OverflowError, struct.error):
                    out["ok"].append(False)
                    for k in cols[2:]:
                        out[k].append(0)
                    continue
                p64 = px.astype(np.int64)
                wgt = (np.arange(w * h, dtype=np.int64) % 997 + 1).reshape(h, w)
                out["ok"].append(True)
                out["width"].append(w)
                out["height"].append(h)
                out["r_sum"].append(int(p64[:, :, 0].sum()))
                out["g_sum"].append(int(p64[:, :, 1].sum()))
                out["b_sum"].append(int(p64[:, :, 2].sum()))
                out["pos_weighted_r"].append(int((wgt * p64[:, :, 0]).sum()))
            yield pd.DataFrame(out)

    return src.mapInPandas(decode, schema=schema)
