"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata — the natural extension of the reference's
FIXED/VARIABLE_WIDTH_BYTES lineage (cpp/src/schema.h:29-37, SURVEY §1.2).

The Spark-side plumbing here is REAL and tested: schemas, partitioning,
Arrow-batched mapInPandas UDF signatures, deterministic batch shapes.

Codec status (rounds 11-15):
- LIVE: BMP (24-bit BI_RGB), PCM16 + G.711 mu-law WAV, PNG across the
  full spec matrix (chunk walk + CRC-32 + zlib inflate + all five
  filter reconstructions; truecolor/grayscale/gray+alpha at 8 and 16
  bit, sub-byte grayscale 1/2/4, palette 1/2/4/8 with tRNS, plain and
  Adam7-interlaced — everything except 16-bit palette, which the spec
  itself excludes), and QOI (full spec in-repo: running index,
  RUN/INDEX/DIFF/LUMA/RGB ops) decode/encode in pure numpy + stdlib —
  no third-party library needed; all sit inside the bit-level
  cross-engine gate (queries/mm_codecs.py). JPEG/FLAC/TIFF/GIF/AVI
  live in sibling operator modules.
- ENV-GATED: formats needing real codec libraries need PIL/cv2/
  soundfile, none of which ship in this container — those decoder
  slots raise NotImplementedError, and ``decoder='fake'`` exercises the
  identical mapInPandas plumbing with a reproducible byte-histogram
  feature vector.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def with_payload_metadata(df: DataFrame, bin_col: str) -> DataFrame:
    """Typed metadata beside an opaque payload: byte size, 4-byte magic
    prefix (hex), content hash. All JVM-side."""
    return df.withColumns(
        {
            "payload_bytes": F.octet_length(F.col(bin_col)).cast("long"),
            "payload_magic": F.hex(F.substring(F.col(bin_col), 1, 4)),
            "payload_sha": F.sha2(F.col(bin_col), 256),
        }
    )


_FEATURE_DIM = 16

_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def sniff_image_format(payload: bytes) -> str | None:
    """Magic-byte format sniff over the native codec family: returns
    'png' | 'gif' | 'bmp' | 'qoi' | 'jpeg' | 'tiff' or None."""
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"qoif":
        return "qoi"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:2] in (b"II", b"MM") and len(payload) >= 4 and \
            payload[2:4] in (b"*\x00", b"\x00*"):
        return "tiff"
    return None


def decode_image_any(payload: bytes) -> "np.ndarray":
    """Decode ANY supported image payload to an HxWx3 uint8 RGB array
    using only the in-repo codec family (BMP 16/24/32-bit + indexed/
    RLE, PNG full matrix, GIF87a/89a incl. animation — the composited
    final canvas — QOI, baseline/progressive JPEG at every gated
    sampling, TIFF strips/tiles/deflate/16-bit/palette). 16-bit
    sources scale to 8 by the high byte; alpha channels drop after
    decode. Raises ValueError for unsupported/undetected formats."""
    fmt = sniff_image_format(payload)
    if fmt == "png":
        _, _, px = decode_png(payload)
        if px.dtype == np.uint16:
            px = (px >> 8).astype(np.uint8)
        return px[:, :, :3] if px.shape[2] >= 3 else np.repeat(px, 3, axis=2)
    if fmt == "gif":
        from river_spark.operators.gif import (
            composite_gif_anim, decode_gif_anim)
        return composite_gif_anim(decode_gif_anim(payload))
    if fmt == "bmp":
        try:
            _, _, px = decode_bmp(payload)
            return px
        except ValueError:
            from river_spark.operators.bmp_indexed import decode_bmp_indexed
            _, _, _, _, idx, pal = decode_bmp_indexed(payload)
            return pal[idx]
    if fmt == "qoi":
        _, _, px = decode_qoi(payload)
        return px[:, :, :3]
    if fmt == "jpeg":
        from river_spark.operators.jpeg import (
            decode_jpeg, upsample_chroma_nn, ycbcr_to_rgb_int)
        _, _, planes = decode_jpeg(payload)
        if len(planes) == 1:
            return np.repeat(planes[0][:, :, None], 3, axis=2)
        y, cb, cr = planes
        fh, fv = y.shape[1] // cb.shape[1], y.shape[0] // cb.shape[0]
        if (fh, fv) != (1, 1):
            cb = upsample_chroma_nn(cb, fh, fv)[: y.shape[0], : y.shape[1]]
            cr = upsample_chroma_nn(cr, fh, fv)[: y.shape[0], : y.shape[1]]
        r, g, b = ycbcr_to_rgb_int(y, cb, cr)
        return np.stack([r, g, b], axis=2)
    if fmt == "tiff":
        from river_spark.operators.tiff import decode_tiff
        _, _, px = decode_tiff(payload)
        if px.dtype == np.uint16:
            px = (px >> 8).astype(np.uint8)
        return px if px.ndim == 3 else np.repeat(px[:, :, None], 3, axis=2)
    raise ValueError("unrecognized image format")


def decode_image_features(
    df: DataFrame, id_col: str, bin_col: str, decoder: str = "fake"
) -> DataFrame:
    """Arrow-batched decode → feature extraction over mapInPandas.

    decoder='fake' -> deterministic 16-dim normalized byte histogram +
    pseudo dimensions derived from content length (REAL plumbing, fake
    pixels). decoder='native' (round 15) -> the in-repo codec family
    via :func:`decode_image_any`: real dimensions and a 16-bin
    normalized histogram over DECODED RGB bytes; undecodable payloads
    yield width=height=0 with zero features (one bad row never fails
    the job). decoder='pillow' (etc.) stays the external-library slot —
    stubbed: raises NotImplementedError because the container has no
    image libraries (and the native family covers the gated formats).
    """
    if decoder not in ("fake", "native"):
        raise NotImplementedError(
            f"decoder {decoder!r} requires an image library not present in "
            "this environment; 'native' uses the in-repo codec family and "
            "'fake' exercises the same mapInPandas plumbing deterministically"
        )

    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

    if decoder == "native":
        def decode_native(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ids, sizes, widths, heights, feats = [], [], [], [], []
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                    buf = bytes(payload) if payload else b""
                    ids.append(doc_id)
                    sizes.append(len(buf))
                    try:
                        px = decode_image_any(buf)
                    except (ValueError, IndexError, OverflowError, struct.error):
                        widths.append(0)
                        heights.append(0)
                        feats.append([0.0] * _FEATURE_DIM)
                        continue
                    heights.append(int(px.shape[0]))
                    widths.append(int(px.shape[1]))
                    hist = np.bincount(
                        (px.reshape(-1) >> 4), minlength=_FEATURE_DIM
                    ).astype(np.float32)
                    feats.append((hist / max(hist.sum(), 1.0)).tolist())
                yield pd.DataFrame(
                    {"doc_id": ids, "n_bytes": sizes, "width": widths,
                     "height": heights, "features": feats}
                )

        return src.mapInPandas(decode_native, schema=_DECODE_SCHEMA)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sizes, widths, heights, feats = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                # NULL binary cells arrive as None — treat as empty so one
                # bad row can't fail the whole job
                buf = np.frombuffer(payload or b"", dtype=np.uint8)
                hist = np.bincount(buf % _FEATURE_DIM, minlength=_FEATURE_DIM).astype(np.float32)
                total = max(hist.sum(), 1.0)
                ids.append(doc_id)
                sizes.append(len(buf))
                widths.append(int(len(buf) % 1920) + 1)
                heights.append(int(len(buf) % 1080) + 1)
                feats.append((hist / total).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_bytes": sizes,
                    "width": widths,
                    "height": heights,
                    "features": feats,
                }
            )

    return src.mapInPandas(decode, schema=_DECODE_SCHEMA)


def resize_image(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    target_w: int = 8,
    target_h: int = 8,
    resizer: str = "fake",
) -> DataFrame:
    """Arrow-batched image resize over mapInPandas — the brief's third
    multimodal primitive beside decode and frame-sample.

    resizer='fake' -> deterministic nearest-neighbor over the pseudo
    byte-grid: source dims derive from content length exactly like the
    fake decoder ((L % 1920)+1 x (L % 1080)+1), pixel (r, c) reads byte
    ``(r*w + c) % L``, and the target grid samples source rows/cols at
    ``(r*h) div th`` / ``(c*w) div tw`` — a pure function of the payload,
    so the output is bit-reproducible cross-engine. resizer='pillow' is
    the production slot — stubbed (no image libraries in this container).
    Empty payloads resize to empty with 1x1 source dims."""
    if resizer != "fake":
        raise NotImplementedError(
            f"resizer {resizer!r} requires an image library not present in "
            "this environment; the 'fake' resizer exercises the same "
            "mapInPandas plumbing deterministically"
        )
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("src_w", T.IntegerType()),
            T.StructField("src_h", T.IntegerType()),
            T.StructField("resized", T.BinaryType()),
        ]
    )
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))
    rr = np.arange(target_h)[:, None]
    cc = np.arange(target_w)[None, :]

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, outs = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = np.frombuffer(payload or b"", dtype=np.uint8)  # NULL -> empty
                L = len(buf)
                ids.append(doc_id)
                if L == 0:
                    ws.append(1), hs.append(1), outs.append(b"")
                    continue
                w, h = (L % 1920) + 1, (L % 1080) + 1
                sr = (rr * h) // target_h
                sc = (cc * w) // target_w
                pos = (sr * w + sc) % L
                ws.append(w), hs.append(h), outs.append(buf[pos].tobytes())
            yield pd.DataFrame({"doc_id": ids, "src_w": ws, "src_h": hs, "resized": outs})

    return src.mapInPandas(rz, schema=out_schema)


def sample_frames(df: DataFrame, id_col: str, bin_col: str, n_frames: int = 4) -> DataFrame:
    """Frame sampling for 'video' payloads: split the byte stream into
    n equal chunks (JVM-side substring arithmetic), one row per frame —
    the partition-preserving explode a real frame sampler would use."""
    frames = F.expr(
        f"""
        transform(sequence(0, {n_frames} - 1), i ->
          substring({bin_col},
                    i * (octet_length({bin_col}) div {n_frames}) + 1,
                    octet_length({bin_col}) div {n_frames}))
        """
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(frames).alias("frame_no", "frame_payload"),
    ).withColumn("frame_bytes", F.octet_length("frame_payload").cast("long"))


def window_signal(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    window_bytes: int = 64,
    hop_bytes: int = 32,
) -> DataFrame:
    """Overlapping fixed-size windows over an opaque signal payload —
    the audio analog of ``sample_frames`` (50% overlap at the defaults,
    the standard STFT hop): one row per window with its byte offset.
    Pure JVM substring arithmetic over the binary column, partition-
    preserving explode; payloads shorter than one window emit no rows
    (a real frontend would zero-pad — byte-level parity is cleaner to
    verify without padding). A real codec would decode PCM first; the
    windowing math is identical either way."""
    wins = F.expr(
        f"""
        CASE WHEN octet_length({bin_col}) >= {window_bytes} THEN
          transform(sequence(0, (octet_length({bin_col}) - {window_bytes}) div {hop_bytes}),
                    i -> substring({bin_col}, i * {hop_bytes} + 1, {window_bytes}))
        ELSE cast(array() as array<binary>) END
        """
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(wins).alias("win_no", "window_payload"),
    ).select(
        "doc_id",
        "win_no",
        (F.col("win_no").cast("long") * hop_bytes).alias("start_byte"),
        "window_payload",
    )


# ---------------------------------------------------------------------------
# REAL codecs (round 11): BMP and PCM WAV decode with numpy + stdlib only.
# These are genuine formats a multimodal pipeline meets; unlike the
# 'pillow'/'cv2' slots (still env-gated — no image libs in this
# container), nothing here needs a third-party codec library, so the
# decode slots below are LIVE, not stubs.
# ---------------------------------------------------------------------------

import struct


def _mask_extract(px32: "np.ndarray", mask: int) -> "np.ndarray":
    """Extract one channel through a BI_BITFIELDS mask and widen to
    8 bits by BIT REPLICATION (what real decoders do for 555/565)."""
    if mask == 0:
        raise ValueError("zero channel mask")
    shift = (mask & -mask).bit_length() - 1
    bits = (mask >> shift).bit_length()
    if bits > 8 or (mask >> shift) != (1 << bits) - 1:
        raise ValueError(f"non-contiguous or too-wide mask 0x{mask:x}")
    v = (px32 >> shift) & ((1 << bits) - 1)
    out = v << (8 - bits)
    rem = 8 - bits
    while rem > 0:
        out |= v >> max(0, bits - rem) if rem < bits else v << (rem - bits)
        rem -= bits
    return (out & 0xFF).astype(np.uint8)


def decode_bmp(payload: bytes):
    """Decode an uncompressed truecolor BMP: the classic 24-bit BI_RGB
    layout plus (round 15) 32-bit BGRx and 16-bit 555 BI_RGB defaults
    and BI_BITFIELDS masks (contiguous masks up to 8 bits per channel,
    e.g. 565 — sub-8-bit channels widen by bit replication). 14-byte
    file header, BITMAPINFOHEADER or larger, 4-byte-padded bottom-up
    rows; top-down negative-height files are handled too. Returns
    (width, height, HxWx3 uint8 RGB array). Raises ValueError on
    anything else — callers decide whether a bad payload fails the row
    or the job. (1/4/8-bit palette and RLE layouts live in
    operators/bmp_indexed.py.)"""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or bpp not in (16, 24, 32) or compression not in (0, 3):
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={compression})")
    if compression == 3:
        if bpp == 24:
            raise ValueError("BI_BITFIELDS is for 16/32-bit pixels")
        # masks sit right after the info header fields (absolute 54)
        # for both the 40-byte header + mask triple and the V4/V5
        # headers, whose RedMask field lands at the same offset
        if len(payload) < 66:
            raise ValueError("truncated BI_BITFIELDS masks")
        rmask, gmask, bmask = struct.unpack_from("<III", payload, 54)
    elif bpp == 16:
        rmask, gmask, bmask = 0x7C00, 0x03E0, 0x001F  # BI_RGB default 555
    elif bpp == 32:
        rmask, gmask, bmask = 0xFF0000, 0x00FF00, 0x0000FF
    bottom_up = height > 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError("degenerate BMP dimensions")
    unit = bpp // 8
    row_size = ((unit * width + 3) // 4) * 4
    need = data_offset + row_size * height
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * height, offset=data_offset
    ).reshape(height, row_size)
    if bpp == 24:
        bgr = rows[:, : 3 * width].reshape(height, width, 3)
        if bottom_up:
            bgr = bgr[::-1]
        return width, height, bgr[:, :, ::-1].copy()  # BGR -> RGB
    raw = rows[:, : unit * width].reshape(height, width, unit)
    px = raw[:, :, 0].astype(np.uint32)
    for k in range(1, unit):
        px |= raw[:, :, k].astype(np.uint32) << (8 * k)
    rgb = np.stack(
        [_mask_extract(px, rmask), _mask_extract(px, gmask),
         _mask_extract(px, bmask)], axis=2)
    if bottom_up:
        rgb = rgb[::-1]
    return width, height, np.ascontiguousarray(rgb)


def decode_wav(payload: bytes):
    """Decode a 16-bit PCM RIFF/WAVE payload by walking its chunks.
    Returns (sample_rate, n_channels, int16 array of interleaved
    samples). Raises ValueError for non-PCM or malformed files."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        csize = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_format != 1 or bits != 16 or n_channels < 1:
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
    return sample_rate, n_channels, samples


_BMP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def decode_bmp_features(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """REAL image decode over mapInPandas: parse each payload as a
    24-bit BMP and emit actual pixel statistics — per-channel means plus
    a 13-bin luminance histogram (16 features total, matching the fake
    decoder's width). Malformed payloads yield ok=false with zero
    features instead of failing the batch — at 100 TB some payloads ARE
    corrupt and one bad row must not kill the job."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sizes, ws, hs, oks, feats = [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = payload or b""
                ids.append(doc_id)
                sizes.append(len(raw))
                try:
                    w, h, rgb = decode_bmp(raw)
                except ValueError:
                    ws.append(0), hs.append(0), oks.append(False)
                    feats.append([0.0] * _FEATURE_DIM)
                    continue
                # integer luminance (ITU-R 601 fixed-point) keeps the
                # histogram deterministic
                r = rgb[:, :, 0].astype(np.int64)
                g = rgb[:, :, 1].astype(np.int64)
                b = rgb[:, :, 2].astype(np.int64)
                luma = (77 * r + 150 * g + 29 * b) >> 8  # 0..255
                hist = np.bincount(
                    np.minimum(luma.ravel() // 20, 12), minlength=13
                ).astype(np.float64)
                n_px = float(w * h)
                f3 = [
                    float(r.sum() / n_px / 255.0),
                    float(g.sum() / n_px / 255.0),
                    float(b.sum() / n_px / 255.0),
                ]
                ws.append(w), hs.append(h), oks.append(True)
                feats.append(
                    np.asarray(f3 + (hist / n_px).tolist(), dtype=np.float32).tolist()
                )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_bytes": sizes,
                    "width": ws,
                    "height": hs,
                    "ok": oks,
                    "features": feats,
                }
            )

    return src.mapInPandas(decode, schema=_BMP_SCHEMA)


_WAV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def decode_wav_stats(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """REAL audio decode over mapInPandas: parse PCM16 WAV chunks and
    emit integer signal statistics — peak |amplitude|, exact sum of
    squares (int64 — the RMS numerator, division deferred to the
    caller so the column stays bit-exact), and integer duration_ms.
    Malformed payloads yield ok=false rows."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "ok", "sample_rate", "n_channels",
                                   "n_samples", "peak", "sum_sq", "duration_ms")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    rate, ch, samples = decode_wav(payload or b"")
                except ValueError:
                    for k, v in (("ok", False), ("sample_rate", 0),
                                 ("n_channels", 0), ("n_samples", 0),
                                 ("peak", 0), ("sum_sq", 0), ("duration_ms", 0)):
                        out[k].append(v)
                    continue
                s64 = samples.astype(np.int64)
                frames = len(samples) // ch
                out["ok"].append(True)
                out["sample_rate"].append(int(rate))
                out["n_channels"].append(int(ch))
                out["n_samples"].append(int(len(samples)))
                out["peak"].append(int(np.abs(s64).max()) if len(s64) else 0)
                out["sum_sq"].append(int((s64 * s64).sum()))
                out["duration_ms"].append(int(frames * 1000 // rate) if rate else 0)
            yield pd.DataFrame(out)

    return src.mapInPandas(decode, schema=_WAV_SCHEMA)


_BMP_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("r_sum", T.LongType()),
        T.StructField("g_sum", T.LongType()),
        T.StructField("b_sum", T.LongType()),
        T.StructField("luma_hist", T.ArrayType(T.LongType())),
    ]
)


def decode_bmp_pixel_stats(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """REAL BMP decode emitting EXACT integer pixel statistics (channel
    sums + 13-bin integer-luminance histogram) — the bit-level-oracle
    twin of :func:`decode_bmp_features`: every output is a BIGINT a SQL
    oracle can recompute from the pixel generation rule, so the decoder
    itself sits inside the cross-engine gate."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "ok", "width", "height",
                                   "r_sum", "g_sum", "b_sum", "luma_hist")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    w, h, rgb = decode_bmp(payload or b"")
                except ValueError:
                    for k, v in (("ok", False), ("width", 0), ("height", 0),
                                 ("r_sum", 0), ("g_sum", 0), ("b_sum", 0),
                                 ("luma_hist", [0] * 13)):
                        out[k].append(v)
                    continue
                r = rgb[:, :, 0].astype(np.int64)
                g = rgb[:, :, 1].astype(np.int64)
                b = rgb[:, :, 2].astype(np.int64)
                luma = (77 * r + 150 * g + 29 * b) >> 8
                hist = np.bincount(
                    np.minimum(luma.ravel() // 20, 12), minlength=13
                )
                out["ok"].append(True)
                out["width"].append(w)
                out["height"].append(h)
                out["r_sum"].append(int(r.sum()))
                out["g_sum"].append(int(g.sum()))
                out["b_sum"].append(int(b.sum()))
                out["luma_hist"].append([int(x) for x in hist])
            yield pd.DataFrame(out)

    return src.mapInPandas(decode, schema=_BMP_PIXEL_SCHEMA)


def encode_bmp(width: int, height: int, rgb: "np.ndarray") -> bytes:
    """Encode an HxWx3 uint8 RGB array as an uncompressed bottom-up
    24-bit BMP — the synthesis half used by the codec round-trip gates
    (and a real encoder in its own right)."""
    row_size = ((3 * width + 3) // 4) * 4
    pad = row_size - 3 * width
    rows = []
    for r in range(height - 1, -1, -1):
        rows.append(rgb[r][:, ::-1].tobytes() + b"\x00" * pad)
    pix = b"".join(rows)
    hdr = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pix), 0, 0, 0, 0)
    )
    return hdr + pix


def encode_wav(sample_rate: int, n_channels: int, samples: "np.ndarray") -> bytes:
    """Encode int16 interleaved samples as a PCM16 RIFF/WAVE payload."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * n_channels * 2, n_channels * 2, 16,
    )
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


# ---------------------------------------------------------------------------
# PNG (round 11, continued): a third LIVE codec — the deflate half is
# stdlib zlib, the chunk walk / CRC / filter reconstruction (including
# the Paeth predictor) is implemented here. The encoder deliberately
# varies the filter type per row (row % 5) so a decoder defect in ANY of
# the five reconstruction paths shifts the decoded pixels, which the
# cross-engine oracle sees as an exact-integer mismatch.
# ---------------------------------------------------------------------------

import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


# Adam7 pass geometry (PNG spec §8.2): (x0, y0, dx, dy) per pass. A
# pass whose sub-image is empty for the given dimensions contributes no
# scanlines to the IDAT stream.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _unfilter(raw: bytes, offset: int, height: int, stride: int, bpp: int):
    """Reconstruct ``height`` filtered scanlines of ``stride`` bytes
    starting at ``raw[offset]`` (each prefixed by its filter-type byte).
    ``bpp`` is the filter unit in BYTES — max(1, ceil(depth*channels/8))
    per PNG spec §9: 3 for RGB8, 4 for RGBA8, 1 for palette at any
    depth <= 8. Returns the (height, stride) unfiltered byte matrix."""
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        off = offset + y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 2:  # Up
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: left-dependent
            cur = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                if ftype == 1:
                    rec = line[x] + a
                elif ftype == 3:
                    rec = line[x] + ((a + int(prev[x])) >> 1)
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    rec = line[x] + _paeth(a, int(prev[x]), c)
                cur[x] = rec & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out


def _unpack_indices(rows: "np.ndarray", width: int, depth: int):
    """Unpack palette indices from unfiltered scanline bytes: ``depth``
    bits per pixel, MSB-first within each byte, rows padded to a whole
    byte (spec §7.2). rows is (h, stride) uint8; returns (h, w) uint8."""
    if depth == 8:
        return rows[:, :width].copy()
    bits = np.unpackbits(rows, axis=1)
    per = bits[:, : width * depth].reshape(rows.shape[0], width, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (per * weights).sum(axis=2).astype(np.uint8)


def _png_pass_dims(width: int, height: int, interlace: int):
    """Yield (x0, y0, dx, dy, w_p, h_p) for each non-empty pass —
    a single full-frame pass when non-interlaced."""
    if interlace == 0:
        yield 0, 0, 1, 1, width, height
        return
    for x0, y0, dx, dy in _ADAM7:
        w_p = (width - x0 + dx - 1) // dx
        h_p = (height - y0 + dy - 1) // dy
        if w_p > 0 and h_p > 0:
            yield x0, y0, dx, dy, w_p, h_p


def decode_png(payload: bytes):
    """Decode a PNG: signature check, chunk walk with CRC-32
    verification, concatenated-IDAT inflate, per-row reconstruction of
    all five PNG filter types (None/Sub/Up/Average/Paeth), Adam7
    7-pass reassembly when interlaced, and palette (PLTE + optional
    tRNS) expansion. Supported variants: truecolor (color 2 = RGB,
    6 = RGBA), grayscale (color 0, expanded to RGB) and gray+alpha
    (color 4, expanded to RGBA) — each at depth 8 or 16 — and indexed
    color (color 3) at depths 1/2/4/8, plus sub-byte grayscale
    (color 0 at 1/2/4 bits, samples scaled 255/(2^d-1) per spec
    §12.5 — bilevel scans, masks); all both plain and
    Adam7-interlaced. Returns (width, height, HxWxC array): uint8 for
    depths <= 8, uint16 for 16-bit (big-endian samples reassembled
    after byte-level unfiltering, spec §9); palette images expand to
    RGB, or RGBA when a tRNS chunk is present. Raises ValueError on
    anything else (sub-byte grayscale, reserved color types) — this
    slot covers every layout libpng-era web/photo corpora carry, end
    to end with zero third-party code."""
    if len(payload) < len(_PNG_SIG) or payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    ihdr = None
    plte = None
    trns = None
    idat = bytearray()
    seen_iend = False
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
            raise ValueError(f"PNG chunk CRC mismatch ({ctype!r})")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            seen_iend = True
            break
        pos += 12 + clen
    if ihdr is None or len(ihdr) != 13 or not idat or not seen_iend:
        raise ValueError("missing IHDR/IDAT/IEND")
    width, height, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if comp != 0 or filt != 0 or interlace not in (0, 1):
        raise ValueError("unsupported PNG compression/filter/interlace")
    if color in (0, 2, 4, 6):
        ok_depths = (1, 2, 4, 8, 16) if color == 0 else (8, 16)
        if depth not in ok_depths:
            raise ValueError(f"unsupported PNG depth {depth} for color {color}")
        nch_raw = {0: 1, 2: 3, 4: 2, 6: 4}[color]
        if trns is not None:
            # spec 11.3.2.1: a single 16-bit-stored color key; forbidden
            # for the alpha-carrying color types
            if color in (4, 6):
                raise ValueError("tRNS is forbidden for alpha color types")
            want = 2 if color == 0 else 6
            if len(trns) != want:
                raise ValueError(f"tRNS must be {want} bytes for color {color}")
            key = struct.unpack(">" + "H" * (want // 2), trns)
            if depth <= 8 and any(k >= (1 << depth) for k in key):
                raise ValueError("tRNS key outside the sample range")
        else:
            key = None
    elif color == 3:
        if depth not in (1, 2, 4, 8):
            raise ValueError(f"unsupported PNG palette depth {depth}")
        if plte is None or len(plte) == 0 or len(plte) % 3 != 0:
            raise ValueError("palette PNG missing/malformed PLTE")
        npal = len(plte) // 3
        if npal > (1 << depth) or npal > 256:
            raise ValueError("PLTE larger than depth allows")
        if trns is not None and len(trns) > npal:
            raise ValueError("tRNS longer than palette")
        nch_raw = 1
    else:
        raise ValueError(f"unsupported PNG color type {color}")
    if width <= 0 or height <= 0 or width > 1 << 24 or height > 1 << 24:
        raise ValueError("degenerate PNG dimensions")
    if width * height > 1 << 28:
        raise ValueError("PNG dimensions exceed decoder budget")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT inflate failed: {exc}") from None
    bpp = max(1, (depth * nch_raw) // 8)
    passes = list(_png_pass_dims(width, height, interlace))

    def _stride(w_p: int) -> int:
        return (w_p * depth * nch_raw + 7) // 8

    expected = sum((_stride(w_p) + 1) * h_p for *_xy, w_p, h_p in passes)
    if len(raw) != expected:
        raise ValueError("PNG scanline payload length mismatch")
    if color == 3:
        img = np.zeros((height, width), dtype=np.uint8)
    else:
        img = np.zeros(
            (height, width, nch_raw),
            dtype=np.uint16 if depth == 16 else np.uint8,
        )
    offset = 0
    for x0, y0, dx, dy, w_p, h_p in passes:
        stride = _stride(w_p)
        rows = _unfilter(raw, offset, h_p, stride, bpp)
        offset += (stride + 1) * h_p
        if color == 3 or (color == 0 and depth < 8):
            sub = _unpack_indices(rows, w_p, depth)
            if color == 0:
                img[y0::dy, x0::dx, 0] = sub
            else:
                img[y0::dy, x0::dx] = sub
        elif depth == 16:
            # big-endian 16-bit samples; filtering ran on raw BYTES
            # (spec §9: the filter unit ignores sample boundaries)
            pairs = rows.reshape(h_p, w_p, nch_raw, 2).astype(np.uint16)
            img[y0::dy, x0::dx] = (pairs[..., 0] << 8) | pairs[..., 1]
        else:
            img[y0::dy, x0::dx] = rows.reshape(h_p, w_p, nch_raw)
    if color == 0:   # grayscale -> RGB (gray replicated)
        amask = (img[:, :, 0] == key[0]) if key is not None else None
        if depth < 8:  # spec §12.5 sample scaling: v * 255/(2^d - 1), exact
            img = img * np.uint8(255 // ((1 << depth) - 1))
        rgb = np.repeat(img, 3, axis=2)
        if amask is None:
            return width, height, rgb
        opaque = np.uint16(65535) if depth == 16 else np.uint8(255)
        alpha = np.where(amask, 0, opaque).astype(rgb.dtype)
        return width, height, np.dstack([rgb, alpha])
    if color == 4:   # gray+alpha -> RGBA
        return width, height, np.dstack(
            [np.repeat(img[:, :, :1], 3, axis=2), img[:, :, 1]]
        )
    if color != 3:
        if color == 2 and key is not None:
            amask = ((img[:, :, 0] == key[0]) & (img[:, :, 1] == key[1])
                     & (img[:, :, 2] == key[2]))
            opaque = np.uint16(65535) if depth == 16 else np.uint8(255)
            alpha = np.where(amask, 0, opaque).astype(img.dtype)
            return width, height, np.dstack([img, alpha])
        return width, height, img
    npal = len(plte) // 3
    if int(img.max(initial=0)) >= npal:
        raise ValueError("palette index out of range")
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(npal, 3)
    rgb = pal[img]
    if trns is None:
        return width, height, rgb
    alpha = np.full(npal, 255, dtype=np.uint8)
    alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
    return width, height, np.dstack([rgb, alpha[img]])


def _filter_scanlines(flat: "np.ndarray", bpp: int) -> bytearray:
    """Filter a (h, stride) int16 byte matrix into PNG scanlines, the
    filter type cycling per row (y % 5) so a decoder defect in ANY of
    the five reconstruction paths shifts decoded pixels on every image
    taller than four rows."""
    height, stride = flat.shape
    lines = bytearray()
    for y in range(height):
        ftype = y % 5
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int16)
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            left = np.concatenate([np.zeros(bpp, dtype=np.int16), cur[:-bpp]])
            enc = cur - left
        elif ftype == 2:
            enc = cur - prev
        elif ftype == 3:
            left = np.concatenate([np.zeros(bpp, dtype=np.int16), cur[:-bpp]])
            enc = cur - ((left + prev) >> 1)
        else:
            left = np.concatenate([np.zeros(bpp, dtype=np.int16), cur[:-bpp]])
            upleft = np.concatenate(
                [np.zeros(bpp, dtype=np.int16), prev[:-bpp]]
            )
            pred = np.array(
                [_paeth(int(a), int(b), int(c))
                 for a, b, c in zip(left, prev, upleft)],
                dtype=np.int16,
            )
            enc = cur - pred
        lines.append(ftype)
        lines.extend((enc & 0xFF).astype(np.uint8).tobytes())
    return lines


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, rgb: "np.ndarray") -> bytes:
    """Encode an HxWx3 (RGB) or HxWx4 (RGBA) uint8 array as an 8-bit
    truecolor PNG. Filter type cycles per row (y % 5), so a round trip
    through :func:`decode_png` exercises every reconstruction path —
    None, Sub, Up, Average, and Paeth."""
    nch = rgb.shape[2]
    color = 2 if nch == 3 else 6
    flat = rgb.reshape(height, width * nch).astype(np.int16)
    lines = _filter_scanlines(flat, nch)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def _pack_indices(sub: "np.ndarray", depth: int) -> "np.ndarray":
    """Pack a (h, w) uint8 index matrix at ``depth`` bits per pixel,
    MSB-first, each row padded to a whole byte. Returns (h, stride)."""
    if depth == 8:
        return sub.copy()
    h, w = sub.shape
    weights = np.arange(depth - 1, -1, -1)
    bits = ((sub[:, :, None] >> weights) & 1).astype(np.uint8).reshape(h, -1)
    pad = (-bits.shape[1]) % 8
    if pad:
        bits = np.hstack([bits, np.zeros((h, pad), dtype=np.uint8)])
    return np.packbits(bits, axis=1)


def encode_png_palette(
    width: int,
    height: int,
    indices: "np.ndarray",
    palette: "np.ndarray",
    trns: "np.ndarray | None" = None,
    depth: int = 8,
    interlace: int = 0,
) -> bytes:
    """Encode a (h, w) uint8 index matrix as an indexed-color PNG
    (color type 3) at ``depth`` bits per pixel (1/2/4/8, MSB-first
    sub-byte packing), with a (n, 3) uint8 PLTE and an optional tRNS
    alpha vector over the first len(trns) entries. The per-row cycling
    filter runs over the PACKED bytes with bpp=1, exactly the unit
    :func:`decode_png` must reconstruct with. ``interlace=1`` emits the
    Adam7 layout — each pass packs its own sub-width rows (per-pass
    padding bits), the combination the decoder's pass loop must get
    right."""
    if depth not in (1, 2, 4, 8):
        raise ValueError(f"bad palette depth {depth}")
    npal = palette.shape[0]
    if npal > (1 << depth) or int(indices.max(initial=0)) >= npal:
        raise ValueError("palette/index out of range for depth")
    idx8 = indices.astype(np.uint8)
    lines = bytearray()
    for x0, y0, dx, dy, _w_p, _h_p in _png_pass_dims(width, height, interlace):
        packed = _pack_indices(idx8[y0::dy, x0::dx], depth)
        lines.extend(_filter_scanlines(packed.astype(np.int16), 1))
    ihdr = struct.pack(">IIBBBBB", width, height, depth, 3, 0, 0, interlace)
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    out += _png_chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    if trns is not None:
        out += _png_chunk(b"tRNS", trns.astype(np.uint8).tobytes())
    out += _png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
    return out + _png_chunk(b"IEND", b"")


def encode_png_gray(
    width: int,
    height: int,
    gray: "np.ndarray",
    alpha: "np.ndarray | None" = None,
    interlace: int = 0,
    depth: int = 8,
) -> bytes:
    """Encode a (h, w) uint8 grayscale matrix as a color-type-0 PNG at
    ``depth`` 1/2/4/8 (sub-byte MSB-first packing, the bilevel/scanned-
    document layouts), or color-type-4 (gray+alpha, depth 8 only per
    spec) when ``alpha`` is given. Filter unit bpp = 1 (gray at any
    depth <= 8) or 2 (gray+alpha); both interlace methods supported
    through the shared pass loop. Sub-byte sample values must already
    be in [0, 2^depth)."""
    if depth not in (1, 2, 4, 8):
        raise ValueError(f"bad grayscale depth {depth}")
    if alpha is not None and depth != 8:
        raise ValueError("gray+alpha requires depth 8 (spec)")
    if depth < 8 and int(gray.max(initial=0)) >= (1 << depth):
        raise ValueError("gray sample out of range for depth")
    if alpha is None:
        color, nch = 0, 1
        px = gray[:, :, None]
    else:
        color, nch = 4, 2
        px = np.dstack([gray, alpha])
    lines = bytearray()
    for x0, y0, dx, dy, w_p, h_p in _png_pass_dims(width, height, interlace):
        if depth < 8:
            sub = _pack_indices(px[y0::dy, x0::dx, 0].astype(np.uint8), depth)
            lines.extend(_filter_scanlines(sub.astype(np.int16), 1))
        else:
            sub = px[y0::dy, x0::dx].reshape(h_p, w_p * nch).astype(np.int16)
            lines.extend(_filter_scanlines(sub, nch))
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color, 0, 0, interlace)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_16(
    width: int, height: int, px: "np.ndarray", interlace: int = 0
) -> bytes:
    """Encode an HxWxC uint16 array as a 16-bit PNG — C = 1 (gray,
    color 0), 2 (gray+alpha, color 4), 3 (RGB, color 2), or 4 (RGBA,
    color 6). Samples go big-endian on the wire; the cycling filter
    runs over raw BYTES with bpp = 2*C, the unit the spec prescribes
    and :func:`decode_png` reconstructs with. Both interlace methods."""
    nch = px.shape[2]
    color = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    lines = bytearray()
    for x0, y0, dx, dy, w_p, h_p in _png_pass_dims(width, height, interlace):
        sub = np.ascontiguousarray(px[y0::dy, x0::dx]).astype(">u2")
        flat = np.frombuffer(sub.tobytes(), dtype=np.uint8).reshape(
            h_p, w_p * nch * 2
        )
        lines.extend(_filter_scanlines(flat.astype(np.int16), 2 * nch))
    ihdr = struct.pack(">IIBBBBB", width, height, 16, color, 0, 0, interlace)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_adam7(width: int, height: int, rgb: "np.ndarray") -> bytes:
    """Encode an HxWx3/HxWx4 uint8 array as an Adam7-INTERLACED 8-bit
    truecolor PNG: the image scatters into the 7 spec passes, each pass
    filtered independently (cycling y % 5 with prev reset at each pass
    start, as the spec requires), all passes deflated into one IDAT."""
    nch = rgb.shape[2]
    color = 2 if nch == 3 else 6
    lines = bytearray()
    for x0, y0, dx, dy, w_p, h_p in _png_pass_dims(width, height, 1):
        sub = rgb[y0::dy, x0::dx].reshape(h_p, w_p * nch).astype(np.int16)
        lines.extend(_filter_scanlines(sub, nch))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 1)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


_PNG_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("r_sum", T.LongType()),
        T.StructField("g_sum", T.LongType()),
        T.StructField("b_sum", T.LongType()),
        T.StructField("pos_weighted_sum", T.LongType()),
    ]
)


def decode_png_pixel_stats(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """REAL PNG decode emitting EXACT integer pixel statistics. Besides
    per-channel sums, emits a position-weighted checksum
    ``sum((j % 997 + 1) * byte_j)`` over the row-major RGB bytes —
    plain channel sums are invariant under pixel permutation, so a
    vertical-flip or row-offset defect could pass them; the weighted sum
    pins the ORDER of every decoded byte."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "ok", "width", "height",
                                   "n_channels", "r_sum", "g_sum", "b_sum",
                                   "pos_weighted_sum")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    w, h, px = decode_png(payload or b"")
                except ValueError:
                    for k, v in (("ok", False), ("width", 0), ("height", 0),
                                 ("n_channels", 0), ("r_sum", 0), ("g_sum", 0),
                                 ("b_sum", 0), ("pos_weighted_sum", 0)):
                        out[k].append(v)
                    continue
                flat = px.reshape(-1).astype(np.int64)
                j = np.arange(flat.size, dtype=np.int64)
                out["ok"].append(True)
                out["width"].append(w)
                out["height"].append(h)
                out["n_channels"].append(px.shape[2])
                out["r_sum"].append(int(px[:, :, 0].astype(np.int64).sum()))
                out["g_sum"].append(int(px[:, :, 1].astype(np.int64).sum()))
                out["b_sum"].append(int(px[:, :, 2].astype(np.int64).sum()))
                out["pos_weighted_sum"].append(int(((j % 997 + 1) * flat).sum()))
            yield pd.DataFrame(out)

    return src.mapInPandas(decode, schema=_PNG_PIXEL_SCHEMA)


# ---------------------------------------------------------------------------
# QOI (round 11, continued): a FOURTH live codec — the "Quite OK Image"
# format (public spec, qoiformat.org). Unlike PNG, the entropy layer
# here is not stdlib zlib: every op (RUN / INDEX / DIFF / LUMA /
# RGB / RGBA), the 64-slot running index with its multiplicative hash,
# and the stream framing are implemented in this file, so the codec is
# self-contained end to end.
# ---------------------------------------------------------------------------

_QOI_MAGIC = b"qoif"
_QOI_END = b"\x00" * 7 + b"\x01"


def _qoi_hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def decode_qoi(payload: bytes):
    """Decode a QOI image (3- or 4-channel, 8-bit). Returns
    (width, height, HxWxC uint8 array). Raises ValueError on bad magic,
    truncated stream, missing end marker, or pixel over/underrun.
    Sequential by construction (each op depends on the previous pixel
    and the running index) — at production scale each payload decodes
    whole inside one Arrow batch row, parallelism comes from rows."""
    if len(payload) < 14 + len(_QOI_END) or payload[:4] != _QOI_MAGIC:
        raise ValueError("not a QOI payload")
    width, height = struct.unpack_from(">II", payload, 4)
    channels, colorspace = payload[12], payload[13]
    if channels not in (3, 4) or colorspace not in (0, 1):
        raise ValueError(f"unsupported QOI header (ch={channels}, cs={colorspace})")
    if width <= 0 or height <= 0:
        raise ValueError("degenerate QOI dimensions")
    if payload[-len(_QOI_END):] != _QOI_END:
        raise ValueError("missing QOI end marker")
    data = payload[14 : -len(_QOI_END)]
    n_px = width * height
    # the output buffer is allocated from HEADER dimensions; the densest
    # legal stream is one RUN op per 62 pixels, so anything claiming more
    # pixels than 62x the chunk bytes is malformed — reject it BEFORE a
    # corrupted header can demand a gigabyte allocation
    if n_px > 62 * len(data):
        raise ValueError("QOI dimensions exceed what the stream could encode")
    out = np.zeros((n_px, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos, px = 0, 0
    while px < n_px:
        if pos >= len(data):
            raise ValueError("QOI stream underrun")
        byte = data[pos]
        pos += 1
        if byte == 0xFE:  # QOI_OP_RGB
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif byte == 0xFF:  # QOI_OP_RGBA
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = byte >> 6
            if tag == 0:  # QOI_OP_INDEX
                r, g, b, a = index[byte & 0x3F]
            elif tag == 1:  # QOI_OP_DIFF (2-bit channel diffs, bias 2)
                r = (r + ((byte >> 4) & 3) - 2) & 0xFF
                g = (g + ((byte >> 2) & 3) - 2) & 0xFF
                b = (b + (byte & 3) - 2) & 0xFF
            elif tag == 2:  # QOI_OP_LUMA (6-bit dg bias 32; 4-bit dr-dg/db-dg bias 8)
                dg = (byte & 0x3F) - 32
                b2 = data[pos]
                pos += 1
                r = (r + dg + ((b2 >> 4) & 0xF) - 8) & 0xFF
                g = (g + dg) & 0xFF
                b = (b + dg + (b2 & 0xF) - 8) & 0xFF
            else:  # QOI_OP_RUN (bias -1)
                run = (byte & 0x3F) + 1
                if px + run > n_px:
                    raise ValueError("QOI run overruns the image")
                out[px : px + run] = (r, g, b, a)
                px += run
                index[_qoi_hash(r, g, b, a)] = (r, g, b, a)
                continue
        index[_qoi_hash(r, g, b, a)] = (r, g, b, a)
        out[px] = (r, g, b, a)
        px += 1
    if pos != len(data):
        raise ValueError("QOI trailing garbage before end marker")
    img = out.reshape(height, width, 4)
    return width, height, (img if channels == 4 else img[:, :, :3]).copy()


def encode_qoi(width: int, height: int, img: "np.ndarray") -> bytes:
    """Encode an HxWx3 or HxWx4 uint8 array as QOI, using every op the
    spec defines (RUN for repeats, INDEX on hash hits, DIFF/LUMA for
    small deltas, RGB/RGBA otherwise) — so a round trip through
    :func:`decode_qoi` exercises the full op set on suitable images."""
    channels = img.shape[2]
    flat = img.reshape(-1, channels)
    out = bytearray(_QOI_MAGIC)
    out += struct.pack(">IIBB", width, height, channels, 0)
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for p in flat:
        r, g, b = int(p[0]), int(p[1]), int(p[2])
        a = int(p[3]) if channels == 4 else 255
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        h = _qoi_hash(r, g, b, a)
        if index[h] == (r, g, b, a):
            out.append(h)
        elif a == pa:
            dr = (r - pr + 128) % 256 - 128
            dg = (g - pg + 128) % 256 - 128
            db = (b - pb + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif -32 <= dg <= 31 and -8 <= dr - dg <= 7 and -8 <= db - dg <= 7:
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes((0xFE, r, g, b))
        else:
            out += bytes((0xFF, r, g, b, a))
        index[h] = (r, g, b, a)
        pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(0xC0 | (run - 1))
    out += _QOI_END
    return bytes(out)


# ---------------------------------------------------------------------------
# G.711 mu-law (round 11, continued): telephony/ASR-corpus audio. The
# WAV chunk walker gains format 7 (8-bit mu-law) alongside PCM16; the
# expansion is the CCITT reference formula in vectorized numpy — and
# the same formula is SQL-expressible, so the decoder sits inside the
# bit-level oracle via integer bit arithmetic in BOTH engines.
# ---------------------------------------------------------------------------


def mulaw_to_linear(u: "np.ndarray") -> "np.ndarray":
    """G.711 mu-law byte -> linear int16 (CCITT reference expansion):
    complement, then ((mantissa<<3) + 0x84) << exponent, re-biased and
    signed. Vectorized; exact integers."""
    u = (~u.astype(np.int64)) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def decode_wav_any(payload: bytes):
    """Like :func:`decode_wav` but also accepts WAVE_FORMAT_MULAW
    (format 7, 8-bit): returns (sample_rate, n_channels, int16 samples)
    with mu-law bytes expanded through :func:`mulaw_to_linear`."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        csize = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_format == 1 and bits == 16 and n_channels >= 1:
        return sample_rate, n_channels, np.frombuffer(data, dtype="<i2",
                                                      count=len(data) // 2)
    if audio_format == 7 and bits == 8 and n_channels >= 1:
        return sample_rate, n_channels, mulaw_to_linear(
            np.frombuffer(data, dtype=np.uint8)
        )
    raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")


def encode_wav_mulaw(sample_rate: int, n_channels: int, ulaw_bytes: bytes) -> bytes:
    """Wrap raw mu-law bytes in a WAVE_FORMAT_MULAW RIFF container."""
    fmt = struct.pack(
        "<HHIIHH", 7, n_channels, sample_rate,
        sample_rate * n_channels, n_channels, 8,
    )
    pad = b"\x00" if len(ulaw_bytes) & 1 else b""
    return (
        b"RIFF" + struct.pack("<I", 36 + len(ulaw_bytes) + len(pad)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(ulaw_bytes)) + ulaw_bytes + pad
    )


_QOI_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("r_sum", T.LongType()),
        T.StructField("g_sum", T.LongType()),
        T.StructField("b_sum", T.LongType()),
        T.StructField("pos_weighted_sum", T.LongType()),
    ]
)


def decode_qoi_pixel_stats(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """REAL QOI decode emitting EXACT integer pixel statistics — same
    contract as :func:`decode_png_pixel_stats` (channel sums + the
    order-pinning position-weighted checksum over row-major RGB bytes),
    with the same malformed-row survival behavior."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "ok", "width", "height",
                                   "n_channels", "r_sum", "g_sum", "b_sum",
                                   "pos_weighted_sum")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    w, h, px = decode_qoi(bytes(payload) if payload else b"")
                except ValueError:
                    for k, v in (("ok", False), ("width", 0), ("height", 0),
                                 ("n_channels", 0), ("r_sum", 0), ("g_sum", 0),
                                 ("b_sum", 0), ("pos_weighted_sum", 0)):
                        out[k].append(v)
                    continue
                rgb = px[:, :, :3]
                flat = rgb.reshape(-1).astype(np.int64)
                j = np.arange(flat.size, dtype=np.int64)
                out["ok"].append(True)
                out["width"].append(w)
                out["height"].append(h)
                out["n_channels"].append(px.shape[2])
                out["r_sum"].append(int(rgb[:, :, 0].astype(np.int64).sum()))
                out["g_sum"].append(int(rgb[:, :, 1].astype(np.int64).sum()))
                out["b_sum"].append(int(rgb[:, :, 2].astype(np.int64).sum()))
                out["pos_weighted_sum"].append(int(((j % 997 + 1) * flat).sum()))
            yield pd.DataFrame(out)

    return src.mapInPandas(decode, schema=_QOI_PIXEL_SCHEMA)


_MULAW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("sum_val", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
    ]
)


def decode_mulaw_stats(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """REAL mu-law WAV decode (format-7 RIFF via :func:`decode_wav_any`,
    expansion via :func:`mulaw_to_linear`) emitting exact integer signal
    stats; malformed payloads survive as ok=false rows."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "ok", "sample_rate", "n_channels",
                                   "n_samples", "peak", "sum_val", "sum_sq")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    rate, ch, s = decode_wav_any(bytes(payload) if payload else b"")
                except ValueError:
                    for k, v in (("ok", False), ("sample_rate", 0),
                                 ("n_channels", 0), ("n_samples", 0),
                                 ("peak", 0), ("sum_val", 0), ("sum_sq", 0)):
                        out[k].append(v)
                    continue
                v = s.astype(np.int64)
                out["ok"].append(True)
                out["sample_rate"].append(rate)
                out["n_channels"].append(ch)
                out["n_samples"].append(int(v.size))
                out["peak"].append(int(np.abs(v).max()) if v.size else 0)
                out["sum_val"].append(int(v.sum()))
                out["sum_sq"].append(int((v * v).sum()))
            yield pd.DataFrame(out)

    return src.mapInPandas(decode, schema=_MULAW_SCHEMA)


def box_downscale_2x(px: "np.ndarray") -> "np.ndarray":
    """REAL resize kernel: 2x2 box-filter downscale with exact integer
    floor-averaging ((a+b+c+d) div 4) per channel. Odd trailing rows /
    columns are dropped (the standard even-crop convention). Input
    HxWxC uint8, output (H//2)x(W//2)xC uint8 — every output byte is a
    pure integer function of the input, so the kernel sits inside the
    cross-engine gate (a float-filter resize could not)."""
    h, w = px.shape[0] & ~1, px.shape[1] & ~1
    if h == 0 or w == 0:
        # keep the (H//2, W//2) contract even when one side is empty
        return np.zeros((h // 2, w // 2, px.shape[2]), dtype=np.uint8)
    a = px[:h, :w].astype(np.int64)
    s = a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2] + a[1::2, 1::2]
    return (s // 4).astype(np.uint8)


_RESIZE_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("r_sum", T.LongType()),
        T.StructField("g_sum", T.LongType()),
        T.StructField("b_sum", T.LongType()),
        T.StructField("pos_weighted_sum", T.LongType()),
    ]
)


def decode_bmp_resize_stats(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """REAL decode + REAL resize: parse each payload as a 24-bit BMP,
    2x2 box-downscale with :func:`box_downscale_2x`, and emit exact
    integer statistics of the RESIZED pixels (channel sums + the
    order-pinning position-weighted checksum). Malformed payloads
    survive as ok=false rows."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "ok", "out_w", "out_h",
                                   "r_sum", "g_sum", "b_sum",
                                   "pos_weighted_sum")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    _, _, rgb = decode_bmp(bytes(payload) if payload else b"")
                except ValueError:
                    for k, v in (("ok", False), ("out_w", 0), ("out_h", 0),
                                 ("r_sum", 0), ("g_sum", 0), ("b_sum", 0),
                                 ("pos_weighted_sum", 0)):
                        out[k].append(v)
                    continue
                small = box_downscale_2x(rgb)
                flat = small.reshape(-1).astype(np.int64)
                j = np.arange(flat.size, dtype=np.int64)
                out["ok"].append(True)
                out["out_w"].append(small.shape[1])
                out["out_h"].append(small.shape[0])
                out["r_sum"].append(int(small[:, :, 0].astype(np.int64).sum())
                                    if small.size else 0)
                out["g_sum"].append(int(small[:, :, 1].astype(np.int64).sum())
                                    if small.size else 0)
                out["b_sum"].append(int(small[:, :, 2].astype(np.int64).sum())
                                    if small.size else 0)
                out["pos_weighted_sum"].append(int(((j % 997 + 1) * flat).sum()))
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=_RESIZE_PIXEL_SCHEMA)


# ---------------------------------------------------------------------------
# GIF87a (round 11, continued): a SIXTH live codec — and the family's
# first LZW entropy layer (PNG brought zlib/DEFLATE, QOI its op-stream;
# GIF adds variable-width LZW with code-table growth and clear-code
# resets, implemented here end to end).
#
# Width discipline (round-trip-pinned across every boundary in
# tests/test_mm_codecs.py): the ENCODER bumps after an insertion when
# next_code == 2^width; the DECODER bumps one insertion EARLIER, at
# next_code == 2^width - 1, because its table lags the encoder's by
# exactly one entry at read time — the classic GIF decoder rule
# (GIF is NOT TIFF-style "early change"). At next_code == 4096 the
# encoder emits a CLEAR and resets; the decoder freezes insertions
# until it sees it.
# ---------------------------------------------------------------------------

_GIF_SIG = b"GIF87a"


def _lzw_encode_gif(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: variable code width (min_code_size+1 .. 12),
    LSB-first bit packing, leading CLEAR, table reset at 4096, EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for b in data:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        if next_code == 4096:
            emit(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        else:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode_gif(data: bytes, min_code_size: int, expected: int) -> bytes:
    """Inverse of :func:`_lzw_encode_gif`, including the KwKwK case
    (code == next free slot) and the insertion freeze at a full table."""
    clear = 1 << min_code_size
    eoi = clear + 1
    total_bits = len(data) * 8
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = []
    prev: bytes | None = None
    out = bytearray()

    def fresh() -> list[bytes]:
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    while True:
        if pos + width > total_bits:
            raise ValueError("LZW code stream underrun (no EOI)")
        chunk = int.from_bytes(data[pos >> 3 : (pos >> 3) + 3], "little")
        code = (chunk >> (pos & 7)) & ((1 << width) - 1)
        pos += width
        if code == clear:
            table = fresh()
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if not table:
            raise ValueError("LZW data before first CLEAR")
        if prev is None:
            if code >= clear:
                raise ValueError(f"first LZW code {code} not a literal")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]  # KwKwK
            else:
                raise ValueError(f"LZW code {code} beyond table ({len(table)})")
            if len(table) < 4096:
                table.append(prev + entry[:1])
                # one insertion EARLIER than the encoder's bump: the
                # decoder's table lags the encoder's by exactly one
                # entry at read time (the classic GIF decoder rule)
                if len(table) == (1 << width) - 1 and width < 12:
                    width += 1
        out.extend(entry)
        if len(out) > expected:
            raise ValueError("LZW output overruns the pixel count")
        prev = entry
    if len(out) != expected:
        raise ValueError(f"LZW produced {len(out)} of {expected} pixels")
    return bytes(out)


def encode_gif(width: int, height: int, indices: "np.ndarray",
               palette: "np.ndarray") -> bytes:
    """Encode an HxW uint8 index array + 256x3 palette as a GIF87a file:
    logical screen descriptor, global color table, one image descriptor
    (no interlace, no local table), LZW-compressed data in <=255-byte
    sub-blocks, trailer."""
    if palette.shape != (256, 3):
        raise ValueError("palette must be 256x3")
    out = bytearray(_GIF_SIG)
    out += struct.pack("<HH", width, height)
    out.append(0xF7)  # GCT present, 8 bits/channel, 256-entry table
    out += b"\x00\x00"  # background index, aspect
    out += palette.astype(np.uint8).tobytes()
    out.append(0x2C)  # image descriptor
    out += struct.pack("<HHHH", 0, 0, width, height)
    out.append(0x00)  # no local color table, not interlaced
    mcs = 8
    out.append(mcs)
    lzw = _lzw_encode_gif(indices.astype(np.uint8).reshape(-1).tobytes(), mcs)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0x00)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(payload: bytes):
    """Decode a GIF87a payload produced by :func:`encode_gif` (one
    image, global 256-color table, no interlace/extensions). Returns
    (width, height, HxW uint8 index array, 256x3 uint8 palette).
    Raises ValueError on bad signature, framing, or LZW defects."""
    if len(payload) < 13 or payload[:6] != _GIF_SIG:
        raise ValueError("not a GIF87a payload")
    sw, sh = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    if not packed & 0x80:
        raise ValueError("missing global color table")
    gct_n = 2 << (packed & 0x07)
    if gct_n != 256:
        raise ValueError(f"unsupported color table size {gct_n}")
    pos = 13
    if pos + 3 * gct_n > len(payload):
        raise ValueError("truncated color table")
    palette = np.frombuffer(payload, np.uint8, 3 * gct_n, pos).reshape(gct_n, 3)
    pos += 3 * gct_n
    if pos >= len(payload) or payload[pos] != 0x2C:
        raise ValueError("expected image descriptor")
    left, top, w, h = struct.unpack_from("<HHHH", payload, pos + 1)
    flags = payload[pos + 9]
    if left or top or (w, h) != (sw, sh):
        raise ValueError("sub-rectangle images unsupported")
    if flags & 0xC0:
        raise ValueError("local color table / interlace unsupported")
    if w <= 0 or h <= 0:
        raise ValueError("degenerate GIF dimensions")
    pos += 10
    mcs = payload[pos]
    pos += 1
    lzw = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("unterminated data sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            break
        if pos + n > len(payload):
            raise ValueError("truncated data sub-block")
        lzw += payload[pos : pos + n]
        pos += n
    if pos >= len(payload) or payload[pos] != 0x3B:
        raise ValueError("missing GIF trailer")
    idx = np.frombuffer(
        _lzw_decode_gif(bytes(lzw), mcs, w * h), dtype=np.uint8
    ).reshape(h, w)
    return w, h, idx, palette.copy()


_GIF_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("idx_sum", T.LongType()),
        T.StructField("pos_weighted_sum", T.LongType()),
        T.StructField("pal_g_sum", T.LongType()),
    ]
)


def decode_gif_index_stats(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """REAL GIF decode emitting EXACT integer index statistics: index
    sum, a position-weighted checksum (pins the ORDER of every decoded
    index — an LZW table or sub-block reassembly defect cannot hide in
    a permutation-invariant sum), and the palette-mapped green-channel
    sum (pins that the global color table was parsed and wired
    through)."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "ok", "width", "height",
                                   "n_pixels", "idx_sum",
                                   "pos_weighted_sum", "pal_g_sum")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    w, h, idx, pal = decode_gif(payload or b"")
                except ValueError:
                    for k, v in (("ok", False), ("width", 0), ("height", 0),
                                 ("n_pixels", 0), ("idx_sum", 0),
                                 ("pos_weighted_sum", 0), ("pal_g_sum", 0)):
                        out[k].append(v)
                    continue
                flat = idx.reshape(-1).astype(np.int64)
                p = np.arange(flat.size, dtype=np.int64)
                out["ok"].append(True)
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(int(flat.size))
                out["idx_sum"].append(int(flat.sum()))
                out["pos_weighted_sum"].append(int(((p % 997 + 1) * flat).sum()))
                out["pal_g_sum"].append(int(pal[flat, 1].astype(np.int64).sum()))
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=_GIF_PIXEL_SCHEMA)
