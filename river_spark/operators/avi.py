"""AVI (uncompressed DIB frames) encode/decode in pure numpy + struct.

Closes the VIDEO modality for the live-codec family: until round 12 the
frame-sampling path ran on synthetic equal-chunk splits
(multimodal.sample_frames); this module makes it a real container —
RIFF('AVI ') with the standard header LISTs (avih main header,
strl/strh/strf stream header + BITMAPINFOHEADER), a movi LIST of '00db'
uncompressed bottom-up BGR frame chunks (the same DIB pixel layout the
BMP codec pins), and the idx1 index real players require. Frames are
LOSSLESS, so the driver oracle (mm_avi_frame_stats) recomputes every
sampled frame's statistics straight from the generation rule.

Subset: one video stream, no audio, no OpenDML extensions. Two frame
codecs: BI_RGB 24-bit DIB (uncompressed) and — round 13 — MJPEG
('MJPG' biCompression, each '00dc' chunk a complete baseline JPEG
decoded by operators/jpeg.py's pinned fixed-point pipeline), the
dominant compressed-AVI layout real capture corpora carry. The decoder
walks RIFF structurally (it does not trust idx1) and exposes
frame-striding so the Spark operator can sample every k-th frame
without touching the skipped payload bytes — for MJPEG that skips the
whole entropy decode of unsampled frames.

Reference scope parity: the reference stores opaque binary payloads;
decode here is a first-class distributed operator per SURVEY.md's
multimodal mandate.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_avi", "decode_avi", "iter_avi_frames",
           "encode_avi_mjpeg", "iter_avi_mjpeg_frames",
           "decode_avi_mjpeg_stats"]

_MJPG = 0x47504A4D  # 'MJPG' little-endian fourcc as biCompression


def _row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3


def _frame_to_dib(frame: np.ndarray) -> bytes:
    """HxWx3 RGB -> bottom-up BGR rows padded to 4 bytes (the DIB layout
    BMP uses; operators/multimodal.decode_bmp pins the same rules)."""
    h, w = frame.shape[:2]
    stride = _row_stride(w)
    out = np.zeros((h, stride), dtype=np.uint8)
    bgr = frame[:, :, ::-1]  # RGB -> BGR
    out[:, : w * 3] = bgr.reshape(h, w * 3)
    return out[::-1].tobytes()  # bottom-up


def _dib_to_frame(data: bytes, width: int, height: int) -> np.ndarray:
    stride = _row_stride(width)
    if len(data) != stride * height:
        raise ValueError("frame chunk size mismatch")
    rows = np.frombuffer(data, dtype=np.uint8).reshape(height, stride)
    bgr = rows[::-1, : width * 3].reshape(height, width, 3)
    return bgr[:, :, ::-1].copy()  # BGR -> RGB


def encode_avi(frames: list, fps: int = 10) -> bytes:
    """Encode HxWx3 uint8 RGB frames as an uncompressed AVI."""
    if not frames:
        raise ValueError("at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must share HxWx3 shape")
    n = len(frames)
    frame_size = _row_stride(w) * h

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    # avih: MainAVIHeader
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,   # microseconds per frame
        frame_size * fps,   # max bytes per sec
        0,                  # padding granularity
        0x10,               # flags: AVIF_HASINDEX
        n,                  # total frames
        0,                  # initial frames
        1,                  # streams
        frame_size,         # suggested buffer size
        w, h, 0, 0, 0, 0,
    )
    # strh: AVIStreamHeader for 'vids'
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps,             # scale, rate -> fps
        0, n, frame_size, 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    # strf: BITMAPINFOHEADER (BI_RGB)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)

    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )

    movi_body = bytearray(b"movi")
    offsets = []
    for f in frames:
        offsets.append(len(movi_body) - 4)  # offset from after 'movi' tag? see idx1 note
        movi_body += chunk(b"00db", _frame_to_dib(f))
    movi = chunk(b"LIST", bytes(movi_body))

    # idx1: one AVIINDEXENTRY per frame; offsets are relative to the
    # start of the 'movi' fourcc (the common convention)
    idx = bytearray()
    off = 4
    for f in frames:
        idx += b"00db" + struct.pack("<III", 0x10, off, frame_size)
        off += 8 + frame_size + (frame_size % 2)
    idx1 = chunk(b"idx1", bytes(idx))

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk_riff(payload: bytes):
    """Validate the outer RIFF and return (width, height, fps, n_frames,
    movi_span, compression, audio) by structural walk. compression is 0
    for BI_RGB DIB frames or the 'MJPG' fourcc value; audio is None or a
    (channels, sample_rate, bits_per_sample) triple when the container
    carries a second 'auds' PCM stream (round 13)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    (riff_len,) = struct.unpack_from("<I", payload, 4)
    if riff_len + 8 > len(payload):
        raise ValueError("truncated RIFF")
    pos = 12
    w = h = fps = n = None
    movi_span = None
    compression = None
    audio = None
    while pos + 8 <= riff_len + 8:
        fourcc = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body_start = pos + 8
        if fourcc == b"LIST":
            ltype = payload[body_start : body_start + 4]
            if ltype == b"movi":
                movi_span = (body_start + 4, body_start + clen)
            elif ltype == b"hdrl":
                ipos = body_start + 4
                end = body_start + clen
                while ipos + 8 <= end:
                    c2 = payload[ipos : ipos + 4]
                    (l2,) = struct.unpack_from("<I", payload, ipos + 4)
                    if c2 == b"avih":
                        us_per_frame, _, _, _, n = struct.unpack_from(
                            "<IIIII", payload, ipos + 8
                        )
                        w, h = struct.unpack_from("<II", payload, ipos + 8 + 32)
                        fps = round(1_000_000 / us_per_frame) if us_per_frame else 0
                    elif c2 == b"LIST" and payload[ipos + 8 : ipos + 12] == b"strl":
                        spos = ipos + 12
                        send = ipos + 8 + l2
                        fcc_type = None
                        while spos + 8 <= send:
                            c3 = payload[spos : spos + 4]
                            (l3,) = struct.unpack_from("<I", payload, spos + 4)
                            if c3 == b"strh":
                                fcc_type = payload[spos + 8 : spos + 12]
                            elif c3 == b"strf" and fcc_type == b"vids":
                                bi = struct.unpack_from("<IiiHHI", payload, spos + 8)
                                if bi[5] == 0:
                                    if bi[4] != 24:
                                        raise ValueError("DIB subset is 24-bit BI_RGB")
                                elif bi[5] != _MJPG:
                                    raise ValueError(
                                        "subset codecs are BI_RGB and MJPG"
                                    )
                                compression = bi[5]
                            elif c3 == b"strf" and fcc_type == b"auds":
                                # WAVEFORMATEX: tag, channels, rate, ..., bits
                                tag, nch, rate = struct.unpack_from(
                                    "<HHI", payload, spos + 8
                                )
                                (bps,) = struct.unpack_from(
                                    "<H", payload, spos + 8 + 14
                                )
                                if tag != 1 or bps != 16:
                                    raise ValueError("audio subset is PCM16")
                                audio = (int(nch), int(rate), int(bps))
                            elif c3 == b"strf":
                                raise ValueError("subset streams are vids/auds")
                            spos += 8 + l3 + (l3 % 2)
                    ipos += 8 + l2 + (l2 % 2)
        pos += 8 + clen + (clen % 2)
    if None in (w, h, fps, n) or movi_span is None or compression is None:
        raise ValueError("missing avih/strf/movi")
    return int(w), int(h), int(fps), int(n), movi_span, int(compression), audio


def iter_avi_frames(payload: bytes, every_k: int = 1):
    """Yield (frame_index, HxWx3 RGB) for every k-th frame. Skipped
    frames are never decoded — the walk advances by chunk length, so
    sampling cost is O(frames kept), the property the Spark operator's
    100 TB posture claims."""
    w, h, fps, n, (mstart, mend), compression, _ = _walk_riff(payload)
    if compression != 0:
        raise ValueError("iter_avi_frames decodes DIB frames only")
    pos = mstart
    fi = 0
    while pos + 8 <= mend:
        fourcc = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        if fourcc in (b"00db", b"00dc"):
            if fi % every_k == 0:
                yield fi, _dib_to_frame(payload[pos + 8 : pos + 8 + clen], w, h)
            fi += 1
        pos += 8 + clen + (clen % 2)
    if fi != n:
        raise ValueError(f"movi carried {fi} frames, header said {n}")


def iter_avi_mjpeg_frames(payload: bytes, every_k: int = 1):
    """Yield (frame_index, jpeg_bytes) for every k-th MJPEG frame.
    Skipped frames never enter the JPEG entropy decoder — the walk
    advances by chunk length, the same O(frames kept) property the DIB
    path pins."""
    w, h, fps, n, (mstart, mend), compression, _ = _walk_riff(payload)
    if compression != _MJPG:
        raise ValueError("not an MJPEG AVI")
    pos = mstart
    fi = 0
    while pos + 8 <= mend:
        fourcc = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        if fourcc in (b"00db", b"00dc"):
            if fi % every_k == 0:
                yield fi, bytes(payload[pos + 8 : pos + 8 + clen])
            fi += 1
        pos += 8 + clen + (clen % 2)
    if fi != n:
        raise ValueError(f"movi carried {fi} frames, header said {n}")


def decode_avi(payload: bytes):
    """Decode everything: returns (width, height, fps, [frames])."""
    w, h, fps, n, _, _, _ = _walk_riff(payload)
    frames = [f for _, f in iter_avi_frames(payload)]
    return w, h, fps, frames


def encode_avi_mjpeg(jpeg_frames: list, width: int, height: int,
                     fps: int = 10) -> bytes:
    """Encode pre-encoded baseline-JPEG frame payloads as an MJPEG AVI:
    same RIFF/hdrl/movi/idx1 skeleton as encode_avi with stream handler
    and biCompression 'MJPG' and one complete JPEG per '00dc' chunk."""
    if not jpeg_frames:
        raise ValueError("at least one frame")
    for jf in jpeg_frames:
        if bytes(jf[:2]) != b"\xff\xd8":
            raise ValueError("MJPEG frames must be JPEG payloads (SOI)")
    n = len(jpeg_frames)
    buf_size = max(len(jf) for jf in jpeg_frames)

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, buf_size * fps, 0, 0x10, n, 0, 1, buf_size,
        width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps, 0, n, buf_size, 0xFFFFFFFF, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, _MJPG, 0, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )

    movi_body = bytearray(b"movi")
    entries = []
    for jf in jpeg_frames:
        entries.append((len(movi_body), len(jf)))
        movi_body += chunk(b"00dc", bytes(jf))
    movi = chunk(b"LIST", bytes(movi_body))

    idx = bytearray()
    for off, clen in entries:
        idx += b"00dc" + struct.pack("<III", 0x10, off, clen)
    idx1 = chunk(b"idx1", bytes(idx))

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

def decode_avi_frame_stats(df, id_col: str, bin_col: str, every_k: int = 2):
    """REAL video frame sampling: walk the AVI container, decode every
    k-th DIB frame, emit EXACT integer statistics (per-doc channel sums
    over the sampled frames plus a frame-index-weighted checksum that
    pins frame ORDER). Skipped frames are never decoded. Malformed
    payloads yield ok=false rows. One Arrow-batched mapInPandas pass;
    payloads never shuffle."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ok", T.BooleanType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("fps", T.IntegerType()),
            T.StructField("n_sampled", T.LongType()),
            T.StructField("r_sum", T.LongType()),
            T.StructField("g_sum", T.LongType()),
            T.StructField("b_sum", T.LongType()),
            T.StructField("frame_weighted_r", T.LongType()),
        ]
    )
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

    def decode(batches):
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "ok", "width", "height", "fps",
                                   "n_sampled", "r_sum", "g_sum", "b_sum",
                                   "frame_weighted_r")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    w, h, fps, n, _, _, _ = _walk_riff(bytes(payload or b""))
                    rs = gs = bs = fwr = 0
                    k = 0
                    for fi, frame in iter_avi_frames(bytes(payload), every_k):
                        f64 = frame.astype(np.int64)
                        fr = int(f64[:, :, 0].sum())
                        rs += fr
                        gs += int(f64[:, :, 1].sum())
                        bs += int(f64[:, :, 2].sum())
                        fwr += (fi + 1) * fr
                        k += 1
                except (ValueError, IndexError, OverflowError, struct.error):
                    for key, v in (("ok", False), ("width", 0), ("height", 0),
                                   ("fps", 0), ("n_sampled", 0), ("r_sum", 0),
                                   ("g_sum", 0), ("b_sum", 0),
                                   ("frame_weighted_r", 0)):
                        out[key].append(v)
                    continue
                out["ok"].append(True)
                out["width"].append(w)
                out["height"].append(h)
                out["fps"].append(fps)
                out["n_sampled"].append(k)
                out["r_sum"].append(rs)
                out["g_sum"].append(gs)
                out["b_sum"].append(bs)
                out["frame_weighted_r"].append(fwr)
            yield pd.DataFrame(out)

    return src.mapInPandas(decode, schema=schema)


def decode_avi_mjpeg_stats(df, id_col: str, bin_col: str, every_k: int = 2):
    """REAL compressed-video frame sampling: walk the MJPEG AVI
    container, run every k-th '00dc' chunk through the full baseline
    JPEG pipeline (operators/jpeg.py — Huffman entropy decode,
    fixed-point dequant+IDCT, pinned integer YCbCr->RGB), emit EXACT
    integer statistics: per-doc RGB channel sums over the sampled
    frames plus a frame-index-weighted Y checksum that pins frame
    ORDER. Skipped frames never enter the entropy decoder. Malformed
    payloads yield ok=false rows. One Arrow-batched mapInPandas pass;
    payloads never shuffle."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from river_spark.operators.jpeg import (
        decode_jpeg,
        upsample_chroma_nn,
        ycbcr_to_rgb_int,
    )

    cols = ("doc_id", "ok", "width", "height", "fps", "n_sampled",
            "r_sum", "g_sum", "b_sum", "frame_weighted_y")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ok", T.BooleanType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("fps", T.IntegerType()),
            T.StructField("n_sampled", T.LongType()),
            T.StructField("r_sum", T.LongType()),
            T.StructField("g_sum", T.LongType()),
            T.StructField("b_sum", T.LongType()),
            T.StructField("frame_weighted_y", T.LongType()),
        ]
    )
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

    def decode(batches):
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    w, h, fps, n, _, comp, _ = _walk_riff(bytes(payload or b""))
                    if comp != _MJPG:
                        raise ValueError("not MJPEG")
                    rs = gs = bs = fwy = 0
                    k = 0
                    for fi, jf in iter_avi_mjpeg_frames(bytes(payload), every_k):
                        jw, jh, planes = decode_jpeg(jf)
                        if (jw, jh) != (w, h):
                            raise ValueError("frame/header size mismatch")
                        y = planes[0]
                        if len(planes) == 3:
                            cb, cr = planes[1], planes[2]
                            if cb.shape != y.shape:
                                cb = upsample_chroma_nn(
                                    cb, y.shape[1] // cb.shape[1],
                                    y.shape[0] // cb.shape[0])
                                cr = upsample_chroma_nn(
                                    cr, y.shape[1] // cr.shape[1],
                                    y.shape[0] // cr.shape[0])
                            r, g, b = ycbcr_to_rgb_int(y, cb, cr)
                        else:
                            r = g = b = y
                        rs += int(r.astype(np.int64).sum())
                        gs += int(g.astype(np.int64).sum())
                        bs += int(b.astype(np.int64).sum())
                        fwy += (fi + 1) * int(y.astype(np.int64).sum())
                        k += 1
                except (ValueError, IndexError, OverflowError, struct.error):
                    for key, v in (("ok", False), ("width", 0), ("height", 0),
                                   ("fps", 0), ("n_sampled", 0), ("r_sum", 0),
                                   ("g_sum", 0), ("b_sum", 0),
                                   ("frame_weighted_y", 0)):
                        out[key].append(v)
                    continue
                out["ok"].append(True)
                out["width"].append(w)
                out["height"].append(h)
                out["fps"].append(fps)
                out["n_sampled"].append(k)
                out["r_sum"].append(rs)
                out["g_sum"].append(gs)
                out["b_sum"].append(bs)
                out["frame_weighted_y"].append(fwy)
            yield pd.DataFrame(out)

    return src.mapInPandas(decode, schema=schema)


def encode_avi_av(frames: list, audio: np.ndarray, fps: int = 10,
                  sample_rate: int = 8000) -> bytes:
    """Encode an INTERLEAVED audio+video AVI (round 13 — the layout
    real capture files use): stream 0 is uncompressed DIB video, stream
    1 is mono PCM16 audio; each video frame's '00db' chunk is followed
    by that frame's slice of audio in an '01wb' chunk (remainder rides
    the last frame)."""
    if not frames:
        raise ValueError("at least one frame")
    audio = np.asarray(audio, dtype=np.int16)
    if audio.ndim != 1 or audio.size == 0:
        raise ValueError("audio must be non-empty 1-D int16")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must share HxWx3 shape")
    n = len(frames)
    frame_size = _row_stride(w) * h
    per = max(1, audio.size // n)

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, frame_size * fps, 0, 0x10, n, 0, 2, frame_size,
        w, h, 0, 0, 0, 0,
    )
    strh_v = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps, 0, n, frame_size, 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    strf_v = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    strh_a = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0,
        1, sample_rate, 0, audio.size, per * 2, 0xFFFFFFFF, 2,
        0, 0, 0, 0,
    )
    # WAVEFORMATEX: PCM, mono, rate, byte rate, block align, 16 bits, cb
    strf_a = struct.pack("<HHIIHHH", 1, 1, sample_rate, sample_rate * 2, 2, 16, 0)

    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh_v) + chunk(b"strf", strf_v))
        + lst(b"strl", chunk(b"strh", strh_a) + chunk(b"strf", strf_a)),
    )

    movi_body = bytearray(b"movi")
    entries = []
    for fi, f in enumerate(frames):
        entries.append((b"00db", len(movi_body), frame_size))
        movi_body += chunk(b"00db", _frame_to_dib(f))
        a0 = fi * per
        a1 = audio.size if fi == n - 1 else min((fi + 1) * per, audio.size)
        blob = audio[a0:a1].astype("<i2").tobytes()
        entries.append((b"01wb", len(movi_body), len(blob)))
        movi_body += chunk(b"01wb", blob)
    movi = chunk(b"LIST", bytes(movi_body))

    idx = bytearray()
    for fourcc, off, clen in entries:
        idx += fourcc + struct.pack("<III", 0x10, off, clen)
    idx1 = chunk(b"idx1", bytes(idx))

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def extract_avi_audio(payload: bytes):
    """Concatenate the '01wb' PCM16 chunks of an interleaved AVI:
    returns (sample_rate, channels, int16 samples). Raises ValueError
    when the container carries no audio stream."""
    w, h, fps, n, (mstart, mend), compression, audio = _walk_riff(payload)
    if audio is None:
        raise ValueError("no audio stream")
    nch, rate, bps = audio
    pos = mstart
    parts = []
    while pos + 8 <= mend:
        fourcc = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        if fourcc == b"01wb":
            if clen % 2:
                raise ValueError("odd PCM16 chunk length")
            parts.append(np.frombuffer(payload, dtype="<i2", count=clen // 2,
                                       offset=pos + 8))
        pos += 8 + clen + (clen % 2)
    if not parts:
        raise ValueError("audio stream declared but no 01wb chunks")
    return rate, nch, np.concatenate(parts).astype(np.int16)


def decode_avi_av_stats(df, id_col: str, bin_col: str, every_k: int = 2):
    """REAL interleaved audio+video decode: one container walk yields
    BOTH the sampled-video channel sums (every k-th DIB frame, skipped
    frames untouched) and the full audio track's exact integer
    statistics. Malformed payloads yield ok=false rows. One
    Arrow-batched mapInPandas pass; payloads never shuffle."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cols = ("doc_id", "ok", "width", "height", "fps", "n_sampled",
            "r_sum", "frame_weighted_r", "sample_rate", "n_audio",
            "audio_sum", "audio_pw_sum")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ok", T.BooleanType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("fps", T.IntegerType()),
            T.StructField("n_sampled", T.LongType()),
            T.StructField("r_sum", T.LongType()),
            T.StructField("frame_weighted_r", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_audio", T.LongType()),
            T.StructField("audio_sum", T.LongType()),
            T.StructField("audio_pw_sum", T.LongType()),
        ]
    )
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

    def decode(batches):
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    raw = bytes(payload or b"")
                    w, h, fps, n, _, comp, audio = _walk_riff(raw)
                    if comp != 0 or audio is None:
                        raise ValueError("expected DIB video + PCM audio")
                    rs = fwr = 0
                    k = 0
                    for fi, frame in iter_avi_frames(raw, every_k):
                        fr = int(frame[:, :, 0].astype(np.int64).sum())
                        rs += fr
                        fwr += (fi + 1) * fr
                        k += 1
                    rate, nch, samples = extract_avi_audio(raw)
                    s64 = samples.astype(np.int64)
                    wgt = np.arange(s64.size, dtype=np.int64) % 997 + 1
                except (ValueError, IndexError, OverflowError, struct.error):
                    out["ok"].append(False)
                    for key in cols[2:]:
                        out[key].append(0)
                    continue
                out["ok"].append(True)
                out["width"].append(w)
                out["height"].append(h)
                out["fps"].append(fps)
                out["n_sampled"].append(k)
                out["r_sum"].append(rs)
                out["frame_weighted_r"].append(fwr)
                out["sample_rate"].append(rate)
                out["n_audio"].append(int(s64.size))
                out["audio_sum"].append(int(s64.sum()))
                out["audio_pw_sum"].append(int((wgt * s64).sum()))
            yield pd.DataFrame(out)

    return src.mapInPandas(decode, schema=schema)
