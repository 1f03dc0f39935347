"""APNG (animated PNG) encode/decode + canvas compositing, pure numpy.

The modern animation twin of operators/gif.py: APNG is what current
web stickers/emoji/screen-recordings ship (every major browser decodes
it). This module adds the animation chunk layer on top of the standing
PNG machinery in operators/multimodal.py (chunk walk with CRC-32,
scanline filter ladder, zlib):

- ``acTL`` (frame count, play count) before IDAT;
- per-frame ``fcTL`` (strictly-sequential sequence number, sub-
  rectangle geometry, delay fraction, dispose_op, blend_op);
- ``fdAT`` frames (sequence number + the frame's own zlib/filter
  stream) after the IDAT default image;
- compositing: canvas starts FULLY TRANSPARENT; blend_op SOURCE
  replaces the region, blend_op OVER alpha-composites with a pinned
  exact-integer convention (documented on :func:`_blend_over`);
  dispose_op none / background (clear the region to transparent) /
  previous (restore the pre-frame canvas), with the spec's first-frame
  dispose-previous -> background downgrade.

Scope: 8-bit RGBA (color type 6) frames — the layout APNG exporters
emit (alpha is required for OVER blending to mean anything); the
first frame is the default image (fcTL sequence 0 before IDAT,
canvas-sized at offset 0, per the spec's constraints on IDAT frames).

Reference parity: the reference engine has no codecs (stream transport
only, src/river/river.pyx); this is the training-data multimodal
family (SURVEY.md). Malformed payloads raise ValueError (corruption-
fuzzed); the canvas allocation is bounded by the standing PNG dims
budget before any frame decodes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from river_spark.operators.multimodal import (
    _PNG_SIG,
    _filter_scanlines,
    _png_chunk,
    _unfilter,
)

_MAX_PIXELS = 1 << 26


def encode_apng(
    canvas_w: int,
    canvas_h: int,
    frames: list[dict],
    num_plays: int = 0,
) -> bytes:
    """Encode RGBA frames as an APNG.

    Each frame dict: ``rgba`` (HxWx4 uint8), ``x``, ``y`` (offsets,
    frame 0 must be canvas-sized at 0,0), ``delay`` ((num, den) tuple,
    default (1, 10)), ``dispose`` (0 none / 1 background / 2 previous),
    ``blend`` (0 source / 1 over; frame 0 must use source per spec).
    """
    if not frames:
        raise ValueError("APNG needs at least one frame")
    out = bytearray(_PNG_SIG)
    ihdr = struct.pack(">IIBBBBB", canvas_w, canvas_h, 8, 6, 0, 0, 0)
    out += _png_chunk(b"IHDR", ihdr)
    out += _png_chunk(b"acTL", struct.pack(">II", len(frames), num_plays))
    seq = 0
    for fi, fr in enumerate(frames):
        rgba = np.asarray(fr["rgba"], dtype=np.uint8)
        if rgba.ndim != 3 or rgba.shape[2] != 4:
            raise ValueError("frames must be HxWx4 RGBA")
        fh, fw = rgba.shape[:2]
        x, y = int(fr.get("x", 0)), int(fr.get("y", 0))
        if x + fw > canvas_w or y + fh > canvas_h or x < 0 or y < 0:
            raise ValueError("frame rectangle outside the canvas")
        dispose = int(fr.get("dispose", 0))
        blend = int(fr.get("blend", 0))
        if not (0 <= dispose <= 2) or blend not in (0, 1):
            raise ValueError("bad dispose/blend op")
        if fi == 0:
            if (x, y, fw, fh) != (0, 0, canvas_w, canvas_h):
                raise ValueError("frame 0 must cover the canvas at (0, 0)")
            if blend != 0:
                raise ValueError("frame 0 must use blend_op SOURCE")
        dn, dd = fr.get("delay", (1, 10))
        fctl = struct.pack(
            ">IIIIIHHBB", seq, fw, fh, x, y, int(dn), int(dd), dispose, blend
        )
        out += _png_chunk(b"fcTL", fctl)
        seq += 1
        flat = rgba.reshape(fh, fw * 4).astype(np.int16)
        stream = zlib.compress(bytes(_filter_scanlines(flat, 4)), 6)
        if fi == 0:
            out += _png_chunk(b"IDAT", stream)
        else:
            out += _png_chunk(b"fdAT", struct.pack(">I", seq) + stream)
            seq += 1
    out += _png_chunk(b"IEND", b"")
    return bytes(out)


def decode_apng(payload: bytes) -> dict:
    """Decode an APNG into metadata + per-frame RGBA sub-images.

    Returns ``width``, ``height``, ``num_plays``, and ``frames`` — each
    a dict with ``x``, ``y``, ``rgba``, ``delay_num``, ``delay_den``,
    ``dispose``, ``blend``. Validates CRCs, the acTL frame count, and
    the strict fcTL/fdAT sequence-number chain. Raises ValueError on
    static PNGs (no acTL — use decode_png) and anything malformed.
    """
    if len(payload) < len(_PNG_SIG) or payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    ihdr = None
    actl = None
    seqs: list[int] = []
    # pending fcTL -> collected stream parts for the current frame
    frames: list[dict] = []
    cur: dict | None = None
    seen_iend = False
    idat_without_fctl = False
    while pos + 8 <= len(payload):
        clen = struct.unpack_from(">I", payload, pos)[0]
        if clen > len(payload):
            raise ValueError("PNG chunk length exceeds payload")
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) != clen or pos + 12 + clen > len(payload):
            raise ValueError("truncated PNG chunk")
        crc = struct.unpack_from(">I", payload, pos + 8 + clen)[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC on {ctype!r}")
        pos += 12 + clen
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"acTL":
            if len(body) != 8:
                raise ValueError("bad acTL size")
            actl = struct.unpack(">II", body)
        elif ctype == b"fcTL":
            if len(body) != 26:
                raise ValueError("bad fcTL size")
            (seq, fw, fh, x, y, dn, dd, dispose, blend) = struct.unpack(
                ">IIIIIHHBB", body
            )
            seqs.append(seq)
            if cur is not None:
                frames.append(cur)
            cur = {
                "x": x, "y": y, "w": fw, "h": fh,
                "delay_num": dn, "delay_den": dd,
                "dispose": dispose, "blend": blend, "stream": bytearray(),
            }
        elif ctype == b"IDAT":
            if cur is None:
                # IDAT before any fcTL: a static PNG (no acTL -> the
                # "not an APNG" error below) or an APNG whose default
                # image is excluded from the animation (outside the
                # subset) — decided after the walk
                idat_without_fctl = True
                continue
            if frames:
                raise ValueError("IDAT after an fdAT frame")
            cur["stream"] += body
        elif ctype == b"fdAT":
            if len(body) < 4:
                raise ValueError("bad fdAT size")
            seqs.append(struct.unpack_from(">I", body, 0)[0])
            if cur is None:
                raise ValueError("fdAT before any fcTL")
            cur["stream"] += body[4:]
        elif ctype == b"IEND":
            seen_iend = True
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    if actl is None:
        raise ValueError("not an APNG (no acTL)")
    if idat_without_fctl:
        raise ValueError(
            "default image excluded from the animation (IDAT before the "
            "first fcTL) is outside the subset"
        )
    if not seen_iend:
        raise ValueError("missing IEND")
    if cur is not None:
        frames.append(cur)
    w, h, depth, color, comp, filt, interlace = ihdr
    if (depth, color, comp, filt, interlace) != (8, 6, 0, 0, 0):
        raise ValueError("APNG subset is 8-bit RGBA, no interlace")
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError("canvas dimensions outside the decoder budget")
    n_frames, num_plays = actl
    if n_frames != len(frames):
        raise ValueError(f"acTL claims {n_frames} frames, found {len(frames)}")
    if seqs != list(range(len(seqs))):
        raise ValueError("fcTL/fdAT sequence numbers not consecutive")
    out_frames = []
    for fi, fr in enumerate(frames):
        fw, fh = fr["w"], fr["h"]
        if fw <= 0 or fh <= 0 or fr["x"] + fw > w or fr["y"] + fh > h:
            raise ValueError("frame rectangle outside the canvas")
        if fi == 0 and (fr["x"], fr["y"], fw, fh) != (0, 0, w, h):
            raise ValueError("frame 0 must cover the canvas at (0, 0)")
        if fr["dispose"] > 2 or fr["blend"] > 1:
            raise ValueError("reserved dispose/blend op")
        try:
            raw = zlib.decompress(bytes(fr["stream"]))
        except zlib.error as exc:
            raise ValueError(f"frame inflate failed: {exc}") from None
        stride = fw * 4
        if len(raw) != (stride + 1) * fh:
            raise ValueError("frame scanline payload length mismatch")
        rows = _unfilter(raw, 0, fh, stride, 4)
        out_frames.append(
            {
                "x": fr["x"], "y": fr["y"],
                "rgba": rows.reshape(fh, fw, 4).copy(),
                "delay_num": fr["delay_num"], "delay_den": fr["delay_den"],
                "dispose": fr["dispose"], "blend": fr["blend"],
            }
        )
    return {
        "width": w, "height": h, "num_plays": num_plays, "frames": out_frames,
    }


def _blend_over(dst: "np.ndarray", src: "np.ndarray") -> "np.ndarray":
    """APNG blend_op OVER on straight-alpha RGBA, exact integers: with
    as_ = src alpha and ad = dst alpha, the composite at scale 255*255
    is  out_a*255*255 = as_*255 + ad*(255 - as_) ... all at int32, each
    channel rounded half-up once at the end — a pinned convention of
    the spec's real-valued source-over equation (the spec defines the
    math over [0,1] reals; any decoder picks a quantization)."""
    as_ = src[:, :, 3].astype(np.int64)
    ad = dst[:, :, 3].astype(np.int64)
    tmp_d = ad * (255 - as_)                    # scale 255*255
    out_a2 = as_ * 255 + tmp_d                  # scale 255*255
    out = np.zeros_like(dst)
    for c in range(3):
        num = src[:, :, c].astype(np.int64) * as_ * 255 \
            + dst[:, :, c].astype(np.int64) * tmp_d
        out[:, :, c] = np.where(
            out_a2 > 0, (2 * num + out_a2) // (2 * np.maximum(out_a2, 1)), 0
        ).astype(np.uint8)
    out[:, :, 3] = ((2 * out_a2 + 255) // 510).astype(np.uint8)
    return out


def composite_apng(anim: dict, all_frames: bool = False):
    """Render decoded frames onto the canvas (starts fully
    transparent). blend SOURCE replaces the region, OVER composites via
    :func:`_blend_over`; dispose none / background (clear region) /
    previous (restore pre-frame canvas), with the first frame's
    dispose-previous downgraded to background per spec. Returns the
    final (H, W, 4) canvas, or all rendered frames when
    ``all_frames``."""
    w, h = anim["width"], anim["height"]
    canvas = np.zeros((h, w, 4), dtype=np.uint8)
    rendered = []
    for fi, fr in enumerate(anim["frames"]):
        dispose = fr["dispose"]
        if fi == 0 and dispose == 2:
            dispose = 1
        prev = canvas.copy() if dispose == 2 else None
        x, y = fr["x"], fr["y"]
        fh, fw = fr["rgba"].shape[:2]
        region = canvas[y : y + fh, x : x + fw]
        if fr["blend"] == 0:
            region[:] = fr["rgba"]
        else:
            region[:] = _blend_over(region, fr["rgba"])
        if all_frames:
            rendered.append(canvas.copy())
        if dispose == 1:
            canvas[y : y + fh, x : x + fw] = 0
        elif dispose == 2:
            canvas = prev
    return rendered if all_frames else canvas


def sample_apng_frames(df, id_col: str, bin_col: str, every_k: int = 2):
    """REAL APNG frame sampling (the GIF sampler's twin,
    operators/gif.sample_gif_anim_frames): one row per k-th RENDERED
    RGBA canvas with exact channel sums and the position-weighted
    checksum. Same scale contract as GIF: dispose/blend make frames
    depend on all prior frames, so sampling saves the stats work and
    emitted volume, not the sequential decode. Malformed payloads
    become ok=False rows."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if every_k < 1:
        raise ValueError("every_k must be >= 1")
    schema = T.StructType(
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
            T.StructField("a_sum", T.LongType()),
            T.StructField("pos_weighted_sum", T.LongType()),
        ]
    )
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))
    cols = [f.name for f in schema.fields]

    def run(batches):
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    anim = decode_apng(bytes(payload) if payload else b"")
                    rendered = composite_apng(anim, all_frames=True)
                except (ValueError, IndexError, OverflowError, struct.error):
                    for k, v in (
                        ("doc_id", doc_id), ("ok", False), ("n_frames", 0),
                        ("frame", 0), ("width", 0), ("height", 0),
                        ("r_sum", 0), ("g_sum", 0), ("b_sum", 0),
                        ("a_sum", 0), ("pos_weighted_sum", 0),
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
                    for ci, key in enumerate(("r_sum", "g_sum", "b_sum", "a_sum")):
                        out[key].append(
                            int(canvas[:, :, ci].astype(np.int64).sum())
                        )
                    out["pos_weighted_sum"].append(
                        int(((p % 997 + 1) * flat).sum())
                    )
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=schema)
