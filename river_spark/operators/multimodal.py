"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata — the natural extension of the reference's
FIXED/VARIABLE_WIDTH_BYTES lineage (cpp/src/schema.h:29-37, SURVEY §1.2).

The Spark-side plumbing here is REAL and tested: schemas, partitioning,
Arrow-batched mapInPandas UDF signatures, deterministic batch shapes.
The actual codec calls are STUBBED (this container ships no image/audio
libraries): ``decode_image`` raises NotImplementedError unless the
deterministic fake decoder is selected, which produces a reproducible
feature vector from the bytes themselves (byte histogram) so the
pipeline around it is fully exercisable end-to-end.
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


def decode_image_features(
    df: DataFrame, id_col: str, bin_col: str, decoder: str = "fake"
) -> DataFrame:
    """Arrow-batched decode → feature extraction over mapInPandas.

    decoder='fake' -> deterministic 16-dim normalized byte histogram +
    pseudo dimensions derived from content length (REAL plumbing, fake
    pixels). decoder='pillow' (etc.) is the production slot — stubbed:
    raises NotImplementedError here because the container has no image
    libraries.
    """
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder {decoder!r} requires an image library not present in "
            "this environment; the 'fake' decoder exercises the same "
            "mapInPandas plumbing deterministically"
        )

    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

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
