"""GIF89a animation: multi-frame encode/decode + canvas compositing.

The GIF87a single-image path lives in operators/multimodal.py
(encode_gif / decode_gif); this module adds the 89a layer that real
animated GIFs use — the dominant real-world GIF shape:

- Graphic Control Extension (disposal method, frame delay, transparent
  index), NETSCAPE2.0 looping application extension, comment / plain-
  text / unknown-label extensions (skipped via the sub-block walk).
- Multiple image descriptors with SUB-RECTANGLE frames (left/top
  offsets into the logical screen).
- LOCAL color tables of any power-of-two size 2..256 (the global table
  is likewise any power-of-two size here, not just 256).
- Per-frame INTERLACE (the 4-pass row order: 0%8, 4%8, 2%4, 1%2).
- Frame compositing with the three disposal methods (leave / restore
  to background / restore to previous) and transparency holes.

Reference parity: the reference engine (pbotros/river) has no image
codecs at all — its scope is stream transport + ingest
(src/river/river.pyx); this module belongs to the training-data
multimodal family this repo adds on top (SURVEY.md "LLM-data-pipeline
operators"). Spark-side plumbing keeps payload bytes inside
Arrow-batched ``mapInPandas`` — payloads are generated, decoded, and
reduced to integer checksums within one task; no image bytes ever
shuffle.

Scale guards: the logical-screen allocation is bounded (<= 2^26
pixels) BEFORE any canvas is built, frame pixel buffers are produced
by the LZW decoder which raises on output overrun (allocation tracks
actual payload bytes, not header claims), and every malformed-payload
path raises ValueError/IndexError/struct.error — the catch set the
Arrow stats operators convert to ok=False rows (corruption-fuzzed in
tests/test_properties_codecs.py).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (query modules import via here)
from pyspark.sql import types as T

from river_spark.operators.multimodal import _lzw_decode_gif, _lzw_encode_gif

_SIG87 = b"GIF87a"
_SIG89 = b"GIF89a"

# (first_row, row_step) for the four GIF interlace passes, in file order.
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))

# Logical-screen allocation bound: reject absurd header claims before
# any canvas allocation (8K x 8K ~ 2^26 px; real GIFs are far smaller).
_MAX_SCREEN_PIXELS = 1 << 26


def _interlace_row_order(height: int) -> list[int]:
    """Row indices in the order an interlaced GIF stores them."""
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, height, step))
    return order


def _table_field(n: int) -> int:
    """GIF size field for an n-entry color table (n = 2^(field+1))."""
    bits = n.bit_length() - 1
    if n < 2 or n > 256 or (1 << bits) != n:
        raise ValueError(f"color table size {n} not a power of two in [2, 256]")
    return bits - 1


def _sub_blocks(data: bytes) -> bytes:
    """Wrap raw bytes into <=255-byte GIF data sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0x00)
    return bytes(out)


def encode_gif_anim(
    screen_w: int,
    screen_h: int,
    global_palette: "np.ndarray",
    frames: list[dict],
    bg_index: int = 0,
    loop: int = 0,
    comment: bytes | None = None,
) -> bytes:
    """Encode a GIF89a animation.

    Each frame dict: ``left``, ``top``, ``indices`` (HxW uint8),
    optional ``local_palette`` ((N,3) uint8 or None -> global table),
    ``transparent`` (index or None), ``disposal`` (0-3), ``interlace``
    (bool), ``delay`` (centiseconds). Index values must be < the size
    of the table the frame uses (LZW literals guarantee this on the
    decode side).
    """
    gct = np.asarray(global_palette, dtype=np.uint8)
    if gct.ndim != 2 or gct.shape[1] != 3:
        raise ValueError("global palette must be (N, 3)")
    gfield = _table_field(gct.shape[0])
    if not (0 <= bg_index < gct.shape[0]):
        raise ValueError("background index outside global table")
    out = bytearray(_SIG89)
    out += struct.pack("<HH", screen_w, screen_h)
    out.append(0x80 | (gfield << 4) | gfield)  # GCT present, color res, size
    out.append(bg_index)
    out.append(0x00)  # aspect
    out += gct.tobytes()
    if loop is not None:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
        out += struct.pack("<H", loop)
        out.append(0x00)
    if comment:
        out += b"\x21\xfe" + _sub_blocks(comment)
    for fr in frames:
        idx = np.asarray(fr["indices"], dtype=np.uint8)
        if idx.ndim != 2:
            raise ValueError("frame indices must be HxW")
        fh, fw = idx.shape
        left, top = int(fr.get("left", 0)), int(fr.get("top", 0))
        if left + fw > screen_w or top + fh > screen_h:
            raise ValueError("frame rectangle outside the logical screen")
        lct = fr.get("local_palette")
        transparent = fr.get("transparent")
        disposal = int(fr.get("disposal", 0))
        if not (0 <= disposal <= 3):
            raise ValueError(f"disposal {disposal} out of range")
        # Graphic Control Extension
        packed = (disposal << 2) | (1 if transparent is not None else 0)
        out += b"\x21\xf9\x04"
        out.append(packed)
        out += struct.pack("<H", int(fr.get("delay", 0)))
        out.append(int(transparent) if transparent is not None else 0)
        out.append(0x00)
        # Image descriptor
        out.append(0x2C)
        out += struct.pack("<HHHH", left, top, fw, fh)
        if lct is not None:
            lct = np.asarray(lct, dtype=np.uint8)
            if lct.ndim != 2 or lct.shape[1] != 3:
                raise ValueError("local palette must be (N, 3)")
            lfield = _table_field(lct.shape[0])
            out.append(0x80 | (0x40 if fr.get("interlace") else 0) | lfield)
            out += lct.tobytes()
            table_n = lct.shape[0]
        else:
            out.append(0x40 if fr.get("interlace") else 0x00)
            table_n = gct.shape[0]
        if int(idx.max(initial=0)) >= table_n:
            raise ValueError("frame index outside its color table")
        if transparent is not None and not (0 <= int(transparent) < table_n):
            raise ValueError("transparent index outside its color table")
        if fr.get("interlace"):
            idx = idx[_interlace_row_order(fh)]
        mcs = max(2, _table_field(table_n) + 1)
        out.append(mcs)
        out += _sub_blocks(_lzw_encode_gif(idx.reshape(-1).tobytes(), mcs))
    out.append(0x3B)
    return bytes(out)


def _skip_sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Collect data sub-blocks starting at ``pos``; return (data, new_pos)."""
    data = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("unterminated data sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(data), pos
        if pos + n > len(payload):
            raise ValueError("truncated data sub-block")
        data += payload[pos : pos + n]
        pos += n


def decode_gif_anim(payload: bytes) -> dict:
    """Decode a GIF87a/89a payload into screen metadata + frame list.

    Returns a dict: ``width``, ``height``, ``bg_index``, ``loop``
    (None if no NETSCAPE extension), ``global_palette``, and
    ``frames`` — each frame a dict with ``left``, ``top``,
    ``indices`` (HxW uint8, deinterlaced to row-major), ``palette``
    (the table the frame uses), ``local`` (bool), ``transparent``
    (index or None), ``disposal``, ``interlaced``, ``delay``.

    Raises ValueError on bad signature/framing/LZW defects, oversized
    logical screens (> 2^26 px), out-of-screen frame rectangles, and
    out-of-table transparent indices.
    """
    if len(payload) < 13 or payload[:6] not in (_SIG87, _SIG89):
        raise ValueError("not a GIF payload")
    sw, sh = struct.unpack_from("<HH", payload, 6)
    if sw <= 0 or sh <= 0:
        raise ValueError("degenerate logical screen")
    if sw * sh > _MAX_SCREEN_PIXELS:
        raise ValueError(f"logical screen {sw}x{sh} exceeds the allocation bound")
    packed, bg_index = payload[10], payload[11]
    if not packed & 0x80:
        raise ValueError("missing global color table")
    gct_n = 2 << (packed & 0x07)
    pos = 13
    if pos + 3 * gct_n > len(payload):
        raise ValueError("truncated global color table")
    gct = np.frombuffer(payload, np.uint8, 3 * gct_n, pos).reshape(gct_n, 3).copy()
    pos += 3 * gct_n
    if bg_index >= gct_n:
        raise ValueError("background index outside global table")

    loop = None
    frames: list[dict] = []
    # pending graphic-control state for the next image descriptor
    disposal, transparent, delay = 0, None, 0
    while True:
        if pos >= len(payload):
            raise ValueError("missing GIF trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("truncated extension")
            label = payload[pos]
            pos += 1
            data, pos = _skip_sub_blocks(payload, pos)
            if label == 0xF9:  # Graphic Control Extension
                if len(data) != 4:
                    raise ValueError(f"GCE block size {len(data)} != 4")
                gpacked = data[0]
                disposal = (gpacked >> 2) & 0x07
                if disposal > 3:
                    raise ValueError(f"reserved disposal method {disposal}")
                (delay,) = struct.unpack_from("<H", data, 1)
                transparent = data[3] if gpacked & 0x01 else None
            elif label == 0xFF and data[:11] == b"NETSCAPE2.0" and len(data) >= 14:
                (loop,) = struct.unpack_from("<H", data, 12)
            # comment (0xFE), plain text (0x01), other app data: skipped
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected block 0x{block:02x}")
        if pos + 9 > len(payload):
            raise ValueError("truncated image descriptor")
        left, top, fw, fh = struct.unpack_from("<HHHH", payload, pos)
        flags = payload[pos + 8]
        pos += 9
        if fw <= 0 or fh <= 0:
            raise ValueError("degenerate frame dimensions")
        if left + fw > sw or top + fh > sh:
            raise ValueError("frame rectangle outside the logical screen")
        if flags & 0x80:  # local color table
            lct_n = 2 << (flags & 0x07)
            if pos + 3 * lct_n > len(payload):
                raise ValueError("truncated local color table")
            table = (
                np.frombuffer(payload, np.uint8, 3 * lct_n, pos)
                .reshape(lct_n, 3)
                .copy()
            )
            pos += 3 * lct_n
            local = True
        else:
            table, local = gct, False
        if transparent is not None and transparent >= table.shape[0]:
            raise ValueError("transparent index outside the frame's table")
        if pos >= len(payload):
            raise ValueError("missing LZW minimum code size")
        mcs = payload[pos]
        pos += 1
        if not (2 <= mcs <= 11):
            raise ValueError(f"LZW minimum code size {mcs} out of range")
        lzw, pos = _skip_sub_blocks(payload, pos)
        idx = np.frombuffer(
            _lzw_decode_gif(lzw, mcs, fw * fh), dtype=np.uint8
        ).reshape(fh, fw)
        interlaced = bool(flags & 0x40)
        if interlaced:
            order = _interlace_row_order(fh)
            deint = np.empty_like(idx)
            deint[order] = idx
            idx = deint
        frames.append(
            {
                "left": left,
                "top": top,
                "indices": idx,
                "palette": table,
                "local": local,
                "transparent": transparent,
                "disposal": disposal,
                "interlaced": interlaced,
                "delay": delay,
            }
        )
        disposal, transparent, delay = 0, None, 0  # GCE applies to ONE image
    if not frames:
        raise ValueError("GIF contains no image")
    return {
        "width": sw,
        "height": sh,
        "bg_index": bg_index,
        "loop": loop,
        "global_palette": gct,
        "frames": frames,
    }


def composite_gif_anim(anim: dict, all_frames: bool = False):
    """Composite decoded frames onto the logical screen.

    The canvas starts as the background color (global_palette[
    bg_index]); each frame paints its rectangle skipping transparent
    pixels, then applies ITS disposal before the next frame: 0/1 leave,
    2 restore the rectangle to the background color, 3 restore the
    whole canvas to its pre-frame state.

    Returns the final (H, W, 3) uint8 canvas, or the list of per-frame
    rendered canvases when ``all_frames`` (what a viewer displays for
    each frame, before that frame's disposal runs).
    """
    sw, sh = anim["width"], anim["height"]
    bg = anim["global_palette"][anim["bg_index"]]
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:] = bg
    rendered = []
    for fr in anim["frames"]:
        prev = canvas.copy() if fr["disposal"] == 3 else None
        l, t = fr["left"], fr["top"]
        idx = fr["indices"]
        fh, fw = idx.shape
        region = canvas[t : t + fh, l : l + fw]
        px = fr["palette"][idx]
        if fr["transparent"] is not None:
            keep = idx == fr["transparent"]
            px = np.where(keep[:, :, None], region, px)
        region[:] = px
        if all_frames:
            rendered.append(canvas.copy())
        if fr["disposal"] == 2:
            canvas[t : t + fh, l : l + fw] = bg
        elif fr["disposal"] == 3:
            canvas = prev
    return rendered if all_frames else canvas


_GIF_ANIM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame", T.IntegerType()),
        T.StructField("left", T.IntegerType()),
        T.StructField("top", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("idx_sum", T.LongType()),
        T.StructField("pos_weighted_sum", T.LongType()),
        T.StructField("pal_r_sum", T.LongType()),
        T.StructField("trans_count", T.LongType()),
        T.StructField("local_table", T.BooleanType()),
        T.StructField("interlaced", T.BooleanType()),
        T.StructField("disposal", T.IntegerType()),
        T.StructField("delay", T.IntegerType()),
    ]
)


def decode_gif_anim_frame_stats(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """REAL GIF89a animation decode emitting one row per FRAME with
    exact integer statistics: the index sum, the position-weighted
    checksum over the DEINTERLACED row-major order (pins the 4-pass
    reassembly — an interlace defect cannot hide in a permutation-
    invariant sum), the palette-mapped red sum (pins WHICH color table
    the frame resolved — local vs global), and the transparent-pixel
    count (pins the GCE parse). Sub-rectangle geometry is emitted
    directly. Compositing/disposal semantics are pinned by unit tests
    against a numpy reference (tests/test_gif_anim.py) — per-frame
    stats stay closed-form for the SQL oracle.

    Malformed payloads become ok=False rows; the catch set matches the
    corruption fuzz (ValueError/IndexError/struct.error)."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))
    cols = [f.name for f in _GIF_ANIM_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    anim = decode_gif_anim(bytes(payload) if payload else b"")
                except (ValueError, IndexError, OverflowError, struct.error):
                    for k, v in (
                        ("doc_id", doc_id), ("ok", False), ("n_frames", 0),
                        ("frame", 0), ("left", 0), ("top", 0), ("width", 0),
                        ("height", 0), ("idx_sum", 0), ("pos_weighted_sum", 0),
                        ("pal_r_sum", 0), ("trans_count", 0),
                        ("local_table", False), ("interlaced", False),
                        ("disposal", 0), ("delay", 0),
                    ):
                        out[k].append(v)
                    continue
                n = len(anim["frames"])
                for i, fr in enumerate(anim["frames"]):
                    idx = fr["indices"]
                    flat = idx.reshape(-1).astype(np.int64)
                    p = np.arange(flat.size, dtype=np.int64)
                    out["doc_id"].append(doc_id)
                    out["ok"].append(True)
                    out["n_frames"].append(n)
                    out["frame"].append(i)
                    out["left"].append(fr["left"])
                    out["top"].append(fr["top"])
                    out["height"].append(idx.shape[0])
                    out["width"].append(idx.shape[1])
                    out["idx_sum"].append(int(flat.sum()))
                    out["pos_weighted_sum"].append(
                        int(((p % 997 + 1) * flat).sum())
                    )
                    out["pal_r_sum"].append(
                        int(fr["palette"][flat, 0].astype(np.int64).sum())
                    )
                    out["trans_count"].append(
                        int((flat == fr["transparent"]).sum())
                        if fr["transparent"] is not None
                        else 0
                    )
                    out["local_table"].append(fr["local"])
                    out["interlaced"].append(fr["interlaced"])
                    out["disposal"].append(fr["disposal"])
                    out["delay"].append(fr["delay"])
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=_GIF_ANIM_SCHEMA)


_GIF_FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("r_sum", T.LongType()),
        T.StructField("g_sum", T.LongType()),
        T.StructField("b_sum", T.LongType()),
        T.StructField("pos_weighted_sum", T.LongType()),
    ]
)


def sample_gif_anim_frames(
    df: DataFrame, id_col: str, bin_col: str, every_k: int = 2
) -> DataFrame:
    """REAL animation frame sampling: decode a GIF89a payload and emit
    one row per k-th RENDERED frame (the composited canvas a viewer
    shows — after sub-rect placement, transparency holes, and the
    previous frames' disposal), with exact RGB sums and the
    position-weighted canvas checksum. The AVI sampler
    (operators/avi.decode_avi_frame_stats) can SKIP undecoded frames
    because RIFF chunks are independent; GIF frames depend on every
    prior frame through disposal/transparency, so all frames up to the
    last sampled one must decode — the sampling saves the STATS work
    and the emitted volume, not the sequential decode (documented
    scale contract). Malformed payloads become ok=False rows."""
    if every_k < 1:
        raise ValueError("every_k must be >= 1")
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))
    cols = [f.name for f in _GIF_FRAME_SAMPLE_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    anim = decode_gif_anim(bytes(payload) if payload else b"")
                    rendered = composite_gif_anim(anim, all_frames=True)
                except (ValueError, IndexError, OverflowError, struct.error):
                    for k, v in (
                        ("doc_id", doc_id), ("ok", False), ("n_frames", 0),
                        ("frame", 0), ("width", 0), ("height", 0),
                        ("r_sum", 0), ("g_sum", 0), ("b_sum", 0),
                        ("pos_weighted_sum", 0),
                    ):
                        out[k].append(v)
                    continue
                n = len(rendered)
                for fi in range(0, n, every_k):
                    canvas = rendered[fi]
                    flat = canvas.reshape(-1).astype(np.int64)
                    p = np.arange(flat.size, dtype=np.int64)
                    out["doc_id"].append(doc_id)
                    out["ok"].append(True)
                    out["n_frames"].append(n)
                    out["frame"].append(fi)
                    out["height"].append(int(canvas.shape[0]))
                    out["width"].append(int(canvas.shape[1]))
                    out["r_sum"].append(int(canvas[:, :, 0].astype(np.int64).sum()))
                    out["g_sum"].append(int(canvas[:, :, 1].astype(np.int64).sum()))
                    out["b_sum"].append(int(canvas[:, :, 2].astype(np.int64).sum()))
                    out["pos_weighted_sum"].append(
                        int(((p % 997 + 1) * flat).sum())
                    )
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=_GIF_FRAME_SAMPLE_SCHEMA)
