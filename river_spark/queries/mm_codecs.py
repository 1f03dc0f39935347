"""REAL multimodal codecs under the cross-engine gate (round 11).

The container still ships no image/audio libraries (PIL/cv2/soundfile
re-checked this round), but BMP, PCM + mu-law WAV, truecolor PNG, and
QOI need none —
they decode with numpy + stdlib (PNG's deflate half is stdlib zlib; the
chunk walk, CRC-32 check, and the five filter reconstructions are
implemented in operators/multimodal). These queries put the LIVE
decoders (decode_bmp / decode_wav / decode_png) inside the bit-level
oracle: payloads are synthesized from a closed-form rule of doc_id
(encode_bmp / encode_wav — the encoder is exercised too), the Spark
side DECODES the actual bytes, and the DuckDB oracle recomputes the
expected statistics from the generation rule WITHOUT ever seeing the
binary — so a header-offset bug, a BGR/RGB swap, a padding mistake, or
a chunk-walk error lands as an integer mismatch, not a plausible float.

Everything emitted is an exact BIGINT (channel sums, luminance
histogram counts, peak, sum of squares, integer milliseconds) — no
float leaves the decoder.

100 TB posture: encode+decode run in ONE Arrow-batched mapInPandas pass
per query (payloads never shuffle; the only exchange is the final
explode/agg on doc-keyed integer rows). The real-corpus variant reads
the payload column off parquet instead of synthesizing it; the decode
stage is identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from river_spark.queries.relational import q
from river_spark.queries.tables import tbl

# ---- generation rules (mirrored in the oracles below) ---------------------
# BMP: w = 4 + doc_id % 5, h = 3 + doc_id % 4,
#      channel byte j (row-major RGB, j in [0, 3wh)) = (doc_id*31 + j) % 256
# WAV: rate = 8000 * (1 + doc_id % 3), channels = 1 + doc_id % 2,
#      frames = 800 + (doc_id % 50) * 16,
#      sample i (interleaved) = ((doc_id*7919 + i*104729) % 65536) - 32768


def _spread_ids(docs):
    """The doc_id stream, spread across the session's full parallelism
    before the Python codec stage.

    At bench/test SFs every input table is one parquet row group, so the
    scan is ONE task — and a bare ``repartition("doc_id")`` does not fix
    that: AQE's partition coalescing sizes post-shuffle partitions by
    SHUFFLED BYTES (a few KB of longs here), is blind to the seconds-per-
    row Python codec work downstream, and merges the exchange right back
    to one partition (r15 measurement: mm_flac_lpc ran 61 s in a single
    task at sf0.1 with 31 cores idle). An EXPLICIT partition count opts
    the exchange out of AQE coalescing; deriving it from
    ``defaultParallelism`` keeps it scale-adaptive (local[4] tests get 4,
    a cluster gets its core count) instead of a constant tuned to one
    box. The exchange itself moves only the 8-byte id column — the
    payloads are synthesized AFTER it and never shuffle (the in-code
    justification the FLAC-partitioned/tiled-TIFF/multichannel queries
    already carried), and the heavy decode inherits the spread because
    mapInPandas preserves partitioning."""
    n = docs.sparkSession.sparkContext.defaultParallelism
    return docs.select("doc_id").repartition(n, "doc_id")


def _bmp_payloads(docs):
    """doc_id -> synthesized BMP payload, one mapInPandas pass."""
    from river_spark.operators.multimodal import encode_bmp

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 4 + d % 5, 3 + d % 4
                j = np.arange(3 * w * h, dtype=np.int64)
                px = ((d * 31 + j) % 256).astype(np.uint8).reshape(h, w, 3)
                ids.append(d)
                payloads.append(encode_bmp(w, h, px))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(gen, schema=schema)


@q(
    "mm_bmp_decode_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
        FROM documents),
    px AS (
        SELECT doc_id, w, h,
               (doc_id * 31 + 3 * g.p) % 256 AS r,
               (doc_id * 31 + 3 * g.p + 1) % 256 AS g_,
               (doc_id * 31 + 3 * g.p + 2) % 256 AS b
        FROM dims, UNNEST(generate_series(0, w * h - 1)) AS g(p)),
    lum AS (
        SELECT doc_id, w, h, r, g_, b,
               least((77 * r + 150 * g_ + 29 * b) // 256 // 20, 12) AS bin
        FROM px),
    doc AS (
        SELECT doc_id, w, h,
               CAST(sum(r) AS BIGINT) AS r_sum,
               CAST(sum(g_) AS BIGINT) AS g_sum,
               CAST(sum(b) AS BIGINT) AS b_sum
        FROM lum GROUP BY 1, 2, 3),
    bins AS (
        SELECT doc_id, bin, CAST(count(*) AS BIGINT) AS n
        FROM lum GROUP BY 1, 2)
    SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
           d.r_sum, d.g_sum, d.b_sum,
           CAST(bins.bin AS INT) AS luma_bin, bins.n
    FROM doc d JOIN bins USING (doc_id)
    """,
    tags=("multimodal", "codec", "image"),
)
def mm_bmp_decode_stats(spark, sf_dir):
    """REAL BMP encode→decode round trip under the bit-level oracle:
    payload pixels are a closed-form function of doc_id, Spark builds
    the actual 24-bit bottom-up padded BMP bytes and DECODES them
    (operators/multimodal.decode_bmp — header parse, BGR order, 4-byte
    row padding, vertical flip), and the oracle recomputes channel sums
    and the 13-bin integer-luminance histogram straight from the rule.
    Any decoder defect shifts an exact BIGINT."""
    from river_spark.operators.multimodal import decode_bmp_pixel_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_bmp_pixel_stats(_bmp_payloads(docs), "doc_id", "payload")
    return (
        stats.filter(F.col("ok"))
        .select(
            "doc_id",
            "width",
            "height",
            "r_sum",
            "g_sum",
            "b_sum",
            F.posexplode("luma_hist").alias("luma_bin", "n"),
        )
        .filter(F.col("n") > 0)
        .select(
            "doc_id", "width", "height", "r_sum", "g_sum", "b_sum",
            F.col("luma_bin").cast("int").alias("luma_bin"), "n",
        )
    )


@q(
    "mm_wav_decode_stats",
    oracle="""
    WITH spec AS (
        SELECT doc_id,
               8000 * (1 + doc_id % 3) AS rate,
               1 + doc_id % 2 AS ch,
               800 + (doc_id % 50) * 16 AS frames
        FROM documents),
    s AS (
        SELECT doc_id, rate, ch, frames,
               ((doc_id * 7919 + g.i * 104729) % 65536) - 32768 AS v
        FROM spec, UNNEST(generate_series(0, frames * ch - 1)) AS g(i))
    SELECT doc_id,
           CAST(rate AS INT) AS sample_rate,
           CAST(ch AS INT) AS n_channels,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(max(abs(v)) AS INT) AS peak,
           CAST(sum(v * v) AS BIGINT) AS sum_sq,
           CAST(frames * 1000 // rate AS BIGINT) AS duration_ms
    FROM s GROUP BY doc_id, rate, ch, frames
    """,
    tags=("multimodal", "codec", "audio"),
)
def mm_wav_decode_stats(spark, sf_dir):
    """REAL PCM16 WAV encode→decode round trip under the bit-level
    oracle: Spark synthesizes the RIFF container (fmt + data chunks,
    word alignment) from a closed-form sample rule, walks it back with
    operators/multimodal.decode_wav, and emits exact integer signal
    stats (peak, sum of squares, duration); the oracle recomputes them
    from the rule without seeing the bytes. A chunk-offset or
    endianness bug moves an integer."""
    from river_spark.operators.multimodal import decode_wav_stats, encode_wav

    docs = tbl(spark, sf_dir, "documents")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                rate = 8000 * (1 + d % 3)
                ch = 1 + d % 2
                frames = 800 + (d % 50) * 16
                i = np.arange(frames * ch, dtype=np.int64)
                v = ((d * 7919 + i * 104729) % 65536) - 32768
                ids.append(d)
                payloads.append(encode_wav(rate, ch, v.astype(np.int16)))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    payloads = _spread_ids(docs).mapInPandas(gen, schema=schema)
    stats = decode_wav_stats(payloads, "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "sample_rate", "n_channels", "n_samples",
        "peak", "sum_sq", "duration_ms",
    )


def _png_payloads(docs):
    """doc_id -> synthesized PNG payload (one mapInPandas pass).
    h >= 5 so every image exercises all five PNG filter types (the
    encoder cycles filter = row % 5)."""
    from river_spark.operators.multimodal import encode_png

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 5 + d % 4, 5 + d % 3
                j = np.arange(3 * w * h, dtype=np.int64)
                px = ((d * 53 + 7 * j) % 256).astype(np.uint8).reshape(h, w, 3)
                ids.append(d)
                payloads.append(encode_png(w, h, px))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(gen, schema=schema)


@q(
    "mm_png_decode_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 5 + doc_id % 4 AS w, 5 + doc_id % 3 AS h
        FROM documents),
    bytes AS (
        SELECT doc_id, w, h, g.j AS j,
               (doc_id * 53 + 7 * g.j) % 256 AS v
        FROM dims, UNNEST(generate_series(0, 3 * w * h - 1)) AS g(j))
    SELECT doc_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(3 AS INT) AS n_channels,
           CAST(sum(CASE WHEN j % 3 = 0 THEN v ELSE 0 END) AS BIGINT) AS r_sum,
           CAST(sum(CASE WHEN j % 3 = 1 THEN v ELSE 0 END) AS BIGINT) AS g_sum,
           CAST(sum(CASE WHEN j % 3 = 2 THEN v ELSE 0 END) AS BIGINT) AS b_sum,
           CAST(sum((j % 997 + 1) * v) AS BIGINT) AS pos_weighted_sum
    FROM bytes GROUP BY doc_id, w, h
    """,
    tags=("multimodal", "codec", "image"),
)
def mm_png_decode_stats(spark, sf_dir):
    """REAL PNG encode→decode round trip under the bit-level oracle.
    The payload pixels are a closed-form function of doc_id; Spark
    builds genuine PNG bytes (chunk layout, CRC-32, zlib deflate, and a
    per-row CYCLING filter type so None/Sub/Up/Average/Paeth are all on
    the wire in every image) and decodes them back with
    operators/multimodal.decode_png. The oracle recomputes per-channel
    sums AND a position-weighted byte checksum straight from the rule —
    channel sums alone are permutation-invariant, the weighted sum pins
    the order of every reconstructed byte, so a Paeth-tiebreak or
    row-offset defect lands as a BIGINT mismatch, never a plausible
    float."""
    from river_spark.operators.multimodal import decode_png_pixel_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_png_pixel_stats(_png_payloads(docs), "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "width", "height", "n_channels",
        "r_sum", "g_sum", "b_sum", "pos_weighted_sum",
    )


# ---- QOI rule: pixel block q = p div 3 (runs of 3); within a 7-block
# stride channels step by +1/+2/+3 (DIFF/LUMA ops); at stride starts
# they jump by +97/+53/+31 (RGB op):
#   r(p) = (doc_id*29 +   (p div 3) + 97*((p div 3) div 7)) % 256
#   g(p) = (doc_id*31 + 2*(p div 3) + 53*((p div 3) div 7)) % 256
#   b(p) = (doc_id*37 + 3*(p div 3) + 31*((p div 3) div 7)) % 256
# w = 6 + doc_id % 4, h = 6 + doc_id % 3


def _qoi_payloads(docs):
    from river_spark.operators.multimodal import encode_qoi

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 6 + d % 4, 6 + d % 3
                p = np.arange(w * h, dtype=np.int64)
                q = p // 3
                img = np.stack(
                    [
                        (d * 29 + q + 97 * (q // 7)) % 256,
                        (d * 31 + 2 * q + 53 * (q // 7)) % 256,
                        (d * 37 + 3 * q + 31 * (q // 7)) % 256,
                    ],
                    axis=1,
                ).astype(np.uint8).reshape(h, w, 3)
                ids.append(d)
                payloads.append(encode_qoi(w, h, img))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(gen, schema=schema)


@q(
    "mm_qoi_decode_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 6 + doc_id % 4 AS w, 6 + doc_id % 3 AS h
        FROM documents),
    px AS (
        SELECT doc_id, w, h, g.p AS p,
               (doc_id * 29 +     (g.p // 3) + 97 * ((g.p // 3) // 7)) % 256 AS r,
               (doc_id * 31 + 2 * (g.p // 3) + 53 * ((g.p // 3) // 7)) % 256 AS g_,
               (doc_id * 37 + 3 * (g.p // 3) + 31 * ((g.p // 3) // 7)) % 256 AS b
        FROM dims, UNNEST(generate_series(0, w * h - 1)) AS g(p))
    SELECT doc_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(3 AS INT) AS n_channels,
           CAST(sum(r) AS BIGINT) AS r_sum,
           CAST(sum(g_) AS BIGINT) AS g_sum,
           CAST(sum(b) AS BIGINT) AS b_sum,
           CAST(sum(((3 * p)     % 997 + 1) * r
                  + ((3 * p + 1) % 997 + 1) * g_
                  + ((3 * p + 2) % 997 + 1) * b) AS BIGINT) AS pos_weighted_sum
    FROM px GROUP BY doc_id, w, h
    """,
    tags=("multimodal", "codec", "image"),
)
def mm_qoi_decode_stats(spark, sf_dir):
    """REAL QOI encode→decode round trip under the bit-level oracle —
    the fourth live codec, and the first whose ENTROPY layer is
    implemented here rather than delegated to stdlib zlib: the 64-slot
    running index, the RUN/INDEX/DIFF/LUMA/RGB op set, and the stream
    framing are all on the wire. The pixel rule repeats each color 3×
    (RUN ops), steps channels by +1/+2/+3 within 7-block strides (LUMA
    ops), and jumps at stride starts (RGB ops), so every decoded image
    crosses multiple op types; the oracle recomputes channel sums and
    the order-pinning position-weighted checksum straight from the
    rule, never seeing the bytes."""
    from river_spark.operators.multimodal import decode_qoi_pixel_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_qoi_pixel_stats(_qoi_payloads(docs), "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "width", "height", "n_channels",
        "r_sum", "g_sum", "b_sum", "pos_weighted_sum",
    )


# ---- mu-law rule: rate = 8000, channels = 1,
#      n = 600 + (doc_id % 40) * 8, byte_i = (doc_id*37 + i*11) % 256


@q(
    "mm_mulaw_decode_stats",
    oracle="""
    WITH spec AS (
        SELECT doc_id, 600 + (doc_id % 40) * 8 AS n FROM documents),
    u AS (
        SELECT doc_id, n, 255 - ((doc_id * 37 + g.i * 11) % 256) AS c
        FROM spec, UNNEST(generate_series(0, n - 1)) AS g(i)),
    s AS (
        SELECT doc_id, n,
               CASE WHEN c >= 128
                    THEN 132 - (((c % 16) * 8 + 132)
                                * CAST(power(2, (c // 16) % 8) AS BIGINT))
                    ELSE (((c % 16) * 8 + 132)
                          * CAST(power(2, (c // 16) % 8) AS BIGINT)) - 132
               END AS v
        FROM u)
    SELECT doc_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(1 AS INT) AS n_channels,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(max(abs(v)) AS INT) AS peak,
           CAST(sum(v) AS BIGINT) AS sum_val,
           CAST(sum(v * v) AS BIGINT) AS sum_sq
    FROM s GROUP BY doc_id, n
    """,
    tags=("multimodal", "codec", "audio"),
)
def mm_mulaw_decode_stats(spark, sf_dir):
    """REAL G.711 mu-law decode under the bit-level oracle: Spark wraps
    a closed-form byte rule in a WAVE_FORMAT_MULAW RIFF container,
    walks it back through the format-aware chunk parser, and expands
    every byte with the CCITT reference formula
    (((mantissa<<3)+0x84)<<exponent, complemented and re-biased); the
    oracle recomputes the SAME expansion with SQL integer arithmetic —
    complement as 255-u, masks as % 16 / // 16 % 8, the shift as an
    exact power-of-two multiply — so a mantissa/exponent/sign defect
    moves peak or sum-of-squares as a BIGINT."""
    from river_spark.operators.multimodal import (
        decode_mulaw_stats,
        encode_wav_mulaw,
    )

    docs = tbl(spark, sf_dir, "documents")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 600 + (d % 40) * 8
                i = np.arange(n, dtype=np.int64)
                raw = ((d * 37 + i * 11) % 256).astype(np.uint8).tobytes()
                ids.append(d)
                payloads.append(encode_wav_mulaw(8000, 1, raw))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    payloads = _spread_ids(docs).mapInPandas(gen, schema=schema)
    stats = decode_mulaw_stats(payloads, "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "sample_rate", "n_channels", "n_samples",
        "peak", "sum_val", "sum_sq",
    )


@q(
    "mm_bmp_resize_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
               (4 + doc_id % 5) // 2 AS ow, (3 + doc_id % 4) // 2 AS oh
        FROM documents),
    px AS (
        SELECT doc_id, ow, oh, g.p AS p, c.ch AS ch,
               ((doc_id * 31 + 3 * ((2 * (g.p // ow)) * w + 2 * (g.p % ow)) + c.ch) % 256
              + (doc_id * 31 + 3 * ((2 * (g.p // ow)) * w + 2 * (g.p % ow) + 1) + c.ch) % 256
              + (doc_id * 31 + 3 * ((2 * (g.p // ow) + 1) * w + 2 * (g.p % ow)) + c.ch) % 256
              + (doc_id * 31 + 3 * ((2 * (g.p // ow) + 1) * w + 2 * (g.p % ow) + 1) + c.ch) % 256
               ) // 4 AS v
        FROM dims,
             UNNEST(generate_series(0, ow * oh - 1)) AS g(p),
             (SELECT UNNEST([0, 1, 2]) AS ch) c)
    SELECT doc_id,
           CAST(ow AS INT) AS out_w,
           CAST(oh AS INT) AS out_h,
           CAST(sum(CASE WHEN ch = 0 THEN v ELSE 0 END) AS BIGINT) AS r_sum,
           CAST(sum(CASE WHEN ch = 1 THEN v ELSE 0 END) AS BIGINT) AS g_sum,
           CAST(sum(CASE WHEN ch = 2 THEN v ELSE 0 END) AS BIGINT) AS b_sum,
           CAST(sum(((3 * p + ch) % 997 + 1) * v) AS BIGINT) AS pos_weighted_sum
    FROM px GROUP BY doc_id, ow, oh
    """,
    tags=("multimodal", "codec", "image", "resize"),
)
def mm_bmp_resize_stats(spark, sf_dir):
    """REAL decode + REAL resize under the bit-level oracle: the BMP
    payloads of mm_bmp_decode_stats' pixel rule are decoded and then
    2x2 box-downscaled with EXACT integer floor-averaging
    (operators/multimodal.box_downscale_2x) — a genuine resize kernel,
    not the fake-grid plumbing slot — and the oracle recomputes every
    RESIZED byte from the rule ((sum of the 2x2 block) div 4), channel
    sums plus the order-pinning position-weighted checksum. A block
    indexing or crop-convention defect moves a BIGINT. Odd trailing
    rows/cols use the even-crop convention in both engines."""
    from river_spark.operators.multimodal import decode_bmp_resize_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_bmp_resize_stats(_bmp_payloads(docs), "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "out_w", "out_h", "r_sum", "g_sum", "b_sum", "pos_weighted_sum",
    )


# ---- GIF rule: palette-indexed with runs of 5 (LZW gets multi-symbol
# strings to build its table from):
#   w = 16 + doc_id % 5, h = 12 + doc_id % 4
#   idx(p) = (doc_id*41 + 11*(p div 5)) % 256        (p row-major in [0, wh))
#   palette[i] = ((i + d) % 256, (2i + 13d) % 256, (3i + 7d) % 256)


def _gif_payloads(docs):
    """doc_id -> synthesized GIF87a payload (one mapInPandas pass).
    Every image carries the full 256-entry global color table and runs
    the real LZW compressor (leading CLEAR, width growth, sub-block
    framing) on its index stream."""
    from river_spark.operators.multimodal import encode_gif

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 16 + d % 5, 12 + d % 4
                p = np.arange(w * h, dtype=np.int64)
                idx = ((d * 41 + 11 * (p // 5)) % 256).astype(np.uint8).reshape(h, w)
                i = np.arange(256, dtype=np.int64)
                pal = np.stack(
                    [(i + d) % 256, (2 * i + 13 * d) % 256, (3 * i + 7 * d) % 256],
                    axis=1,
                ).astype(np.uint8)
                ids.append(d)
                payloads.append(encode_gif(w, h, idx, pal))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(gen, schema=schema)


@q(
    "mm_gif_decode_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 16 + doc_id % 5 AS w, 12 + doc_id % 4 AS h
        FROM documents),
    px AS (
        SELECT doc_id, w, h, g.p AS p,
               (doc_id * 41 + 11 * (g.p // 5)) % 256 AS idx
        FROM dims, UNNEST(generate_series(0, w * h - 1)) AS g(p))
    SELECT doc_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(sum(idx) AS BIGINT) AS idx_sum,
           CAST(sum((p % 997 + 1) * idx) AS BIGINT) AS pos_weighted_sum,
           CAST(sum((2 * idx + 13 * doc_id) % 256) AS BIGINT) AS pal_g_sum
    FROM px GROUP BY doc_id, w, h
    """,
    tags=("multimodal", "codec", "image"),
)
def mm_gif_decode_stats(spark, sf_dir):
    """REAL GIF87a encode→decode round trip under the bit-level oracle —
    the LIVE codec family's first LZW entropy layer (PNG brought
    DEFLATE, QOI its op stream). The index stream is a closed-form
    function of doc_id with runs of 5 so the LZW table genuinely
    builds multi-symbol strings; Spark produces real GIF bytes (screen
    descriptor, 256-entry global color table, variable-width LZW with
    leading CLEAR and sub-block framing) and decodes them back with
    operators/multimodal.decode_gif. The oracle recomputes the index
    sum, a position-weighted checksum (pins the ORDER of every decoded
    index — an LZW-table or sub-block reassembly defect can't hide in
    a permutation-invariant sum), and the palette-mapped green sum
    (pins the color-table parse) straight from the rule, never seeing
    the bytes. Width-growth past 9 bits and the 4096-table CLEAR reset
    are exercised by dedicated round-trip tests (fixture images stay
    small); the decoder rejects truncation, bad signatures, and LZW
    over/underruns (tests)."""
    from river_spark.operators.multimodal import decode_gif_index_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_gif_index_stats(_gif_payloads(docs), "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "width", "height", "n_pixels",
        "idx_sum", "pos_weighted_sum", "pal_g_sum",
    )


# ---- JPEG rule: constant 8x8 blocks (the DCT of a constant block has
# only its DC term, so the fixed-point encode->decode chain is a pure
# closed form the oracle mirrors literally — see operators/jpeg.py):
#   wb = 2 + doc_id % 3 blocks across, hb = 2 + doc_id % 2 down
#   block p (row-major): Y = (d*31 + 5p) % 256, Cb = (d*17 + 3p) % 256,
#                        Cr = (d*23 + 7p) % 256


def _jpeg_payloads(docs):
    """doc_id -> synthesized baseline-JPEG payload (one mapInPandas
    pass): 3-component 4:4:4, flat quant 16/17, Annex-K Huffman,
    restart markers every 2 MCUs so the RST path runs under the driver
    gate too."""
    from river_spark.operators.jpeg import encode_jpeg

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                wb, hb = 2 + d % 3, 2 + d % 2
                p = np.arange(wb * hb, dtype=np.int64)
                yv = ((d * 31 + 5 * p) % 256).astype(np.uint8)
                cbv = ((d * 17 + 3 * p) % 256).astype(np.uint8)
                crv = ((d * 23 + 7 * p) % 256).astype(np.uint8)
                planes = [
                    np.kron(v.reshape(hb, wb), np.ones((8, 8), dtype=np.uint8))
                    for v in (yv, cbv, crv)
                ]
                ids.append(d)
                payloads.append(encode_jpeg(planes, restart_interval=2))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(gen, schema=schema)


@q(
    "mm_jpeg_decode_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 2 + doc_id % 3 AS wb, 2 + doc_id % 2 AS hb
        FROM documents),
    blk AS (
        SELECT doc_id, wb, hb,
               (doc_id * 31 + 5 * g.p) % 256 AS yv,
               (doc_id * 17 + 3 * g.p) % 256 AS cbv,
               (doc_id * 23 + 7 * g.p) % 256 AS crv
        FROM dims, UNNEST(generate_series(0, wb * hb - 1)) AS g(p)),
    -- fixed-point forward DCT DC term: F = (n * (8*11585)^2 + 2^29) >> 30
    f AS (
        SELECT doc_id, wb, hb,
          CAST(floor(((yv - 128) * 8589582400 + 536870912) / 1073741824.0) AS BIGINT) AS fy,
          CAST(floor(((cbv - 128) * 8589582400 + 536870912) / 1073741824.0) AS BIGINT) AS fcb,
          CAST(floor(((crv - 128) * 8589582400 + 536870912) / 1073741824.0) AS BIGINT) AS fcr
        FROM blk),
    -- round-half-up quantization, steps 16 (luma) / 17 (chroma)
    qc AS (
        SELECT doc_id, wb, hb,
          CAST(floor((2 * fy + 16) / 32.0) AS BIGINT) AS qy,
          CAST(floor((2 * fcb + 17) / 34.0) AS BIGINT) AS qcb,
          CAST(floor((2 * fcr + 17) / 34.0) AS BIGINT) AS qcr
        FROM f),
    -- dequant + fixed-point IDCT of the DC-only block: 11585^2 * level
    rc AS (
        SELECT doc_id, wb, hb,
          GREATEST(0, LEAST(255, CAST(floor((134212225 * qy * 16 + 536870912) / 1073741824.0) AS BIGINT) + 128)) AS ry,
          GREATEST(0, LEAST(255, CAST(floor((134212225 * qcb * 17 + 536870912) / 1073741824.0) AS BIGINT) + 128)) AS rcb,
          GREATEST(0, LEAST(255, CAST(floor((134212225 * qcr * 17 + 536870912) / 1073741824.0) AS BIGINT) + 128)) AS rcr
        FROM qc),
    -- pinned integer JFIF YCbCr->RGB (scale 2^16, +2^15 rounding)
    rgb AS (
        SELECT doc_id, wb, hb, ry,
          GREATEST(0, LEAST(255, ry + CAST(floor((91881 * (rcr - 128) + 32768) / 65536.0) AS BIGINT))) AS r,
          GREATEST(0, LEAST(255, ry - CAST(floor((46802 * (rcr - 128) + 22554 * (rcb - 128) + 32768) / 65536.0) AS BIGINT))) AS g_,
          GREATEST(0, LEAST(255, ry + CAST(floor((116130 * (rcb - 128) + 32768) / 65536.0) AS BIGINT))) AS b
        FROM rc)
    SELECT doc_id, CAST(8 * wb AS INT) AS width, CAST(8 * hb AS INT) AS height,
           CAST(64 * sum(r) AS BIGINT) AS r_sum,
           CAST(64 * sum(g_) AS BIGINT) AS g_sum,
           CAST(64 * sum(b) AS BIGINT) AS b_sum,
           CAST(64 * sum(ry) AS BIGINT) AS y_sum
    FROM rgb GROUP BY doc_id, wb, hb
    """,
    tags=("multimodal", "codec", "image"),
)
def mm_jpeg_decode_stats(spark, sf_dir):
    """REAL baseline-JPEG encode→decode round trip under the bit-level
    oracle — the live-codec family's DCT entropy format (GIF brought
    LZW, PNG DEFLATE). Payloads are genuine T.81 baseline files:
    SOI/DQT/SOF0/DHT/DRI/SOS marker stream, Annex-K Huffman tables, DC
    prediction with restart-marker resets every 2 MCUs, byte-stuffed
    entropy data. Spark decodes them with operators/jpeg.decode_jpeg
    (tables rebuilt from the DHT segments, fixed-point dequant+IDCT,
    pinned integer YCbCr→RGB) and the oracle recomputes every BIGINT
    from the generation rule by mirroring the exact integer kernels —
    never seeing the bytes. Constant blocks make the lossy chain a
    closed form; AC-coefficient coding, ZRL, table growth, and
    foreign-table decode are exercised by dedicated round-trip tests
    (tests/test_jpeg_codec.py)."""
    from river_spark.operators.jpeg import decode_jpeg_rgb_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_jpeg_rgb_stats(_jpeg_payloads(docs), "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "width", "height", "r_sum", "g_sum", "b_sum", "y_sum"
    )


# ---- TIFF rule: grayscale with runs of 6 (PackBits gets real runs AND
# real literal stretches where the run phase shears against row cuts):
#   w = 20 + doc_id % 7, h = 12 + doc_id % 5
#   v(p) = (doc_id*37 + 9*(p div 6)) % 256          (p row-major)


def _tiff_payloads(docs):
    """doc_id -> synthesized baseline TIFF payload (one mapInPandas
    pass): little-endian, PackBits strips of 4 rows with a partial
    final strip for 2 of every 5 docs."""
    from river_spark.operators.tiff import encode_tiff

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 20 + d % 7, 12 + d % 5
                p = np.arange(w * h, dtype=np.int64)
                px = ((d * 37 + 9 * (p // 6)) % 256).astype(np.uint8).reshape(h, w)
                ids.append(d)
                payloads.append(encode_tiff(px, rows_per_strip=4))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(gen, schema=schema)


@q(
    "mm_tiff_decode_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 20 + doc_id % 7 AS w, 12 + doc_id % 5 AS h
        FROM documents),
    px AS (
        SELECT doc_id, w, h, g.p AS p,
               (doc_id * 37 + 9 * (g.p // 6)) % 256 AS v
        FROM dims, UNNEST(generate_series(0, w * h - 1)) AS g(p))
    SELECT doc_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(sum(v) AS BIGINT) AS pix_sum,
           CAST(sum((p % 997 + 1) * v) AS BIGINT) AS pos_weighted_sum,
           CAST(sum(CASE WHEN v > 127 THEN 1 ELSE 0 END) AS BIGINT) AS n_bright
    FROM px GROUP BY doc_id, w, h
    """,
    tags=("multimodal", "codec", "image"),
)
def mm_tiff_decode_stats(spark, sf_dir):
    """REAL baseline-TIFF encode→decode round trip under the bit-level
    oracle — the codec family's tag-directory container (IFD walk with
    inline-vs-offset values, ascending tag order) plus multi-strip
    assembly and the PackBits RLE layer (TIFF 6.0 §9). PackBits is
    lossless, so the oracle recomputes the pixel sum, the
    position-weighted checksum (pins strip ORDER — a swapped or
    off-by-one strip can't hide in a permutation-invariant sum), and a
    brightness count straight from the rule, never seeing the bytes.
    Big-endian (MM) decode, RGB chunky samples, uncompressed strips,
    and the PackBits reject paths are covered by
    tests/test_tiff_codec.py."""
    from river_spark.operators.tiff import decode_tiff_pixel_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_tiff_pixel_stats(_tiff_payloads(docs), "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "width", "height", "n_pixels",
        "pix_sum", "pos_weighted_sum", "n_bright",
    )


# ---- IMA ADPCM rule: all-zero nibble blocks with rule-generated
# headers (zero nibble: predictor += step>>3, index -= 1), so every
# decoded sample is a closed-form prefix sum over the step table:
#   n_blocks = 2 + doc_id % 3, block_align 16 (24 nibble samples/block)
#   block b: pred0 = ((d*131 + b*977) % 16001) - 8000,
#            idx0  = 5 + (d + 3b) % 26,  rate = 8000 + (d % 3)*4000


def _adpcm_payloads(docs):
    """doc_id -> synthesized IMA-ADPCM WAV (one mapInPandas pass)."""
    from river_spark.operators.adpcm import build_adpcm_fixture_wav

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nb = 2 + d % 3
                blocks = [
                    (
                        ((d * 131 + b * 977) % 16001) - 8000,
                        5 + (d + 3 * b) % 26,
                        bytes(12),
                    )
                    for b in range(nb)
                ]
                ids.append(d)
                payloads.append(
                    build_adpcm_fixture_wav(8000 + (d % 3) * 4000, blocks, block_align=16)
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(gen, schema=schema)


@q(
    "mm_adpcm_decode_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 2 + doc_id % 3 AS nb FROM documents),
    blk AS (
        SELECT doc_id, nb, g.b AS b,
               ((doc_id * 131 + g.b * 977) % 16001) - 8000 AS pred0,
               5 + (doc_id + 3 * g.b) % 26 AS idx0
        FROM dims, UNNEST(generate_series(0, nb - 1)) AS g(b)),
    diffs AS (
        SELECT doc_id, nb, b, pred0, k.k AS k,
               [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767][GREATEST(0, idx0 - (k.k - 1)) + 1] // 8 AS diff
        FROM blk, UNNEST(generate_series(1, 24)) AS k(k)),
    bsum AS (
        SELECT doc_id, nb, b,
               25 * any_value(pred0) + sum((25 - k) * diff) AS block_sum,
               any_value(pred0) + sum(diff) AS block_last
        FROM diffs GROUP BY doc_id, nb, b)
    SELECT doc_id,
           CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
           CAST(nb * 25 AS BIGINT) AS n_samples,
           CAST(sum(block_sum) AS BIGINT) AS sample_sum,
           CAST(max(CASE WHEN b = nb - 1 THEN block_last END) AS BIGINT) AS last_sample
    FROM bsum GROUP BY doc_id, nb
    """,
    tags=("multimodal", "codec", "audio"),
)
def mm_adpcm_decode_stats(spark, sf_dir):
    """REAL IMA-ADPCM (WAV format tag 0x0011) decode under the
    bit-level oracle — the audio family's adaptive-delta coder (PCM and
    mu-law are already live). Payloads are genuine block-structured
    ADPCM WAVs (RIFF chunk walk, fmt extension with samples-per-block,
    fact chunk, per-block predictor/step-index headers); Spark runs the
    full nibble state machine (operators/adpcm.decode_adpcm_wav) and
    the oracle mirrors the closed-form step-table walk of the all-zero
    nibble fixture with a literal 89-entry table — never seeing the
    bytes. The complete quantizer (all 16 nibbles, sign handling,
    int16/index clamps, encoder-decoder lockstep) is pinned by
    tests/test_adpcm_codec.py."""
    from river_spark.operators.adpcm import decode_adpcm_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_adpcm_stats(_adpcm_payloads(docs), "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "sample_rate", "n_samples", "sample_sum", "last_sample"
    )


# ---- JPEG 4:2:0 rule: the dominant real-world layout — each MCU
# interleaves four constant luma blocks with one constant Cb and Cr
# block at half resolution (nearest-neighbor upsampling keeps the
# closed form):
#   wm = 1 + d % 3 MCUs across, hm = 1 + d % 2 down (16px MCUs)
#   MCU p, luma sub-block s in [0,4): Y = (d*31 + 5*(4p+s)) % 256
#   chroma per MCU: Cb = (d*17 + 3p) % 256, Cr = (d*23 + 7p) % 256


def _jpeg420_payloads(docs):
    """doc_id -> synthesized 4:2:0 baseline JPEG (one mapInPandas
    pass); restart markers every 2 MCUs."""
    from river_spark.operators.jpeg import encode_jpeg_420

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                wm, hm = 1 + d % 3, 1 + d % 2
                y = np.zeros((16 * hm, 16 * wm), dtype=np.uint8)
                cb = np.zeros((8 * hm, 8 * wm), dtype=np.uint8)
                cr = np.zeros((8 * hm, 8 * wm), dtype=np.uint8)
                for p in range(wm * hm):
                    my, mx = divmod(p, wm)
                    for s in range(4):
                        sy, sx = divmod(s, 2)
                        y[
                            my * 16 + sy * 8 : my * 16 + sy * 8 + 8,
                            mx * 16 + sx * 8 : mx * 16 + sx * 8 + 8,
                        ] = (d * 31 + 5 * (4 * p + s)) % 256
                    cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = (d * 17 + 3 * p) % 256
                    cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = (d * 23 + 7 * p) % 256
                ids.append(d)
                payloads.append(encode_jpeg_420(y, cb, cr, restart_interval=2))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(gen, schema=schema)


@q(
    "mm_jpeg420_decode_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 1 + doc_id % 3 AS wm, 1 + doc_id % 2 AS hm
        FROM documents),
    blk AS (
        SELECT doc_id, wm, hm,
               (doc_id * 31 + 5 * (4 * g.p + s.s)) % 256 AS yv,
               (doc_id * 17 + 3 * g.p) % 256 AS cbv,
               (doc_id * 23 + 7 * g.p) % 256 AS crv
        FROM dims,
             UNNEST(generate_series(0, wm * hm - 1)) AS g(p),
             UNNEST(generate_series(0, 3)) AS s(s)),
    f AS (
        SELECT doc_id, wm, hm,
          CAST(floor(((yv - 128) * 8589582400 + 536870912) / 1073741824.0) AS BIGINT) AS fy,
          CAST(floor(((cbv - 128) * 8589582400 + 536870912) / 1073741824.0) AS BIGINT) AS fcb,
          CAST(floor(((crv - 128) * 8589582400 + 536870912) / 1073741824.0) AS BIGINT) AS fcr
        FROM blk),
    qc AS (
        SELECT doc_id, wm, hm,
          CAST(floor((2 * fy + 16) / 32.0) AS BIGINT) AS qy,
          CAST(floor((2 * fcb + 17) / 34.0) AS BIGINT) AS qcb,
          CAST(floor((2 * fcr + 17) / 34.0) AS BIGINT) AS qcr
        FROM f),
    rc AS (
        SELECT doc_id, wm, hm,
          GREATEST(0, LEAST(255, CAST(floor((134212225 * qy * 16 + 536870912) / 1073741824.0) AS BIGINT) + 128)) AS ry,
          GREATEST(0, LEAST(255, CAST(floor((134212225 * qcb * 17 + 536870912) / 1073741824.0) AS BIGINT) + 128)) AS rcb,
          GREATEST(0, LEAST(255, CAST(floor((134212225 * qcr * 17 + 536870912) / 1073741824.0) AS BIGINT) + 128)) AS rcr
        FROM qc),
    rgb AS (
        SELECT doc_id, wm, hm, ry,
          GREATEST(0, LEAST(255, ry + CAST(floor((91881 * (rcr - 128) + 32768) / 65536.0) AS BIGINT))) AS r,
          GREATEST(0, LEAST(255, ry - CAST(floor((46802 * (rcr - 128) + 22554 * (rcb - 128) + 32768) / 65536.0) AS BIGINT))) AS g_,
          GREATEST(0, LEAST(255, ry + CAST(floor((116130 * (rcb - 128) + 32768) / 65536.0) AS BIGINT))) AS b
        FROM rc)
    SELECT doc_id, CAST(16 * wm AS INT) AS width, CAST(16 * hm AS INT) AS height,
           CAST(64 * sum(r) AS BIGINT) AS r_sum,
           CAST(64 * sum(g_) AS BIGINT) AS g_sum,
           CAST(64 * sum(b) AS BIGINT) AS b_sum,
           CAST(64 * sum(ry) AS BIGINT) AS y_sum
    FROM rgb GROUP BY doc_id, wm, hm
    """,
    tags=("multimodal", "codec", "image"),
)
def mm_jpeg420_decode_stats(spark, sf_dir):
    """REAL 4:2:0 chroma-subsampled JPEG decode under the bit-level
    oracle — the layout virtually every camera and web JPEG uses. Each
    MCU interleaves four luma blocks (2x2 raster) with one half-
    resolution Cb and Cr block; the decoder reads the sampling factors
    from SOF0, walks the interleaved MCU structure (with restart
    resets every 2 MCUs), and reconstructs chroma by the pinned
    nearest-neighbor upsampling — so each luma block pairs with its
    MCU's constant chroma and the fixed-point closed form carries
    through exactly. The oracle mirrors the same integer kernels as
    mm_jpeg_decode_stats with the 4-luma-per-MCU generation rule."""
    from river_spark.operators.jpeg import decode_jpeg_rgb_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_jpeg_rgb_stats(_jpeg420_payloads(docs), "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "width", "height", "r_sum", "g_sum", "b_sum", "y_sum"
    )


# ---- FLAC rule: sawtooth-plus-residue signal, SQL closed form:
#   n = 300 + (d % 5) * 100, rate = 8000 + (d % 3) * 4000
#   s(i) = ((d*13 + 7i) % 4001) - 2000 + (i % 17) * 3
# (ramps reward the fixed predictors; the mod-4001 wrap points force
# large residuals, so blocks genuinely mix predictor orders)


def _flac_payloads(docs):
    """doc_id -> synthesized FLAC payload (one mapInPandas pass)."""
    from river_spark.operators.flac import encode_flac

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 300 + (d % 5) * 100
                i = np.arange(n, dtype=np.int64)
                s = ((d * 13 + 7 * i) % 4001) - 2000 + (i % 17) * 3
                ids.append(d)
                payloads.append(
                    encode_flac(8000 + (d % 3) * 4000, s.astype(np.int16))
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(gen, schema=schema)


@q(
    "mm_flac_decode_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 300 + (doc_id % 5) * 100 AS n FROM documents),
    s AS (
        SELECT doc_id, n, g.i AS i,
               ((doc_id * 13 + 7 * g.i) % 4001) - 2000 + (g.i % 17) * 3 AS v
        FROM dims, UNNEST(generate_series(0, n - 1)) AS g(i))
    SELECT doc_id,
           CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
           CAST(n AS BIGINT) AS n_samples,
           CAST(sum(v) AS BIGINT) AS sample_sum,
           CAST(sum(abs(v)) AS BIGINT) AS abs_sum,
           CAST(sum((i % 997 + 1) * v) AS BIGINT) AS pos_weighted_sum
    FROM s GROUP BY doc_id, n
    """,
    tags=("multimodal", "codec", "audio"),
)
def mm_flac_decode_stats(spark, sf_dir):
    """REAL FLAC (fixed-predictor subset) encode→decode round trip
    under the bit-level oracle — the audio family's entropy-coded
    LOSSLESS format (ADPCM brought adaptive delta, mu-law companding;
    this brings Rice coding). Payloads are genuine FLAC streams: fLaC
    magic, STREAMINFO, sync-coded frames with UTF-8 frame numbers,
    CRC-8 header and CRC-16 frame checksums, per-block best fixed
    predictor (order 0-4) with MSB-first unary/Rice residuals. Spark
    decodes with operators/flac.decode_flac (CRCs verified, predictors
    reconstructed); losslessness makes the oracle a pure restatement of
    the generation rule — the position-weighted checksum pins sample
    ORDER through the frame/predictor reassembly. Constant/verbatim/
    escape subframes and the reject paths are pinned by
    tests/test_flac_codec.py."""
    from river_spark.operators.flac import decode_flac_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_flac_stats(_flac_payloads(docs), "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "sample_rate", "n_samples",
        "sample_sum", "abs_sum", "pos_weighted_sum",
    )


# ---- AVI rule (video modality goes LIVE): uncompressed DIB frames,
#   n_frames = 4 + d % 5, w = 8 + 4*(d % 3), h = 6 + 2*(d % 2),
#   fps = 10 + d % 7; frame f, channel byte j (row-major RGB):
#   v = (d*31 + 97*f + j) % 256. The query samples every 2nd frame.


def _avi_payloads(docs):
    """doc_id -> synthesized uncompressed AVI (one mapInPandas pass)."""
    from river_spark.operators.avi import encode_avi

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nf = 4 + d % 5
                w, h = 8 + 4 * (d % 3), 6 + 2 * (d % 2)
                j = np.arange(3 * w * h, dtype=np.int64)
                frames = [
                    ((d * 31 + 97 * f + j) % 256).astype(np.uint8).reshape(h, w, 3)
                    for f in range(nf)
                ]
                ids.append(d)
                payloads.append(encode_avi(frames, fps=10 + d % 7))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(gen, schema=schema)


@q(
    "mm_avi_frame_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 4 + doc_id % 5 AS nf,
               8 + 4 * (doc_id % 3) AS w, 6 + 2 * (doc_id % 2) AS h
        FROM documents),
    fr AS (  -- every 2nd frame
        SELECT doc_id, nf, w, h, g.f AS f
        FROM dims, UNNEST(generate_series(0, nf - 1)) AS g(f)
        WHERE g.f % 2 = 0),
    px AS (
        SELECT doc_id, w, h, f,
               (doc_id * 31 + 97 * f + 3 * p.p) % 256 AS r,
               (doc_id * 31 + 97 * f + 3 * p.p + 1) % 256 AS g_,
               (doc_id * 31 + 97 * f + 3 * p.p + 2) % 256 AS b
        FROM fr, UNNEST(generate_series(0, w * h - 1)) AS p(p)),
    per_frame AS (
        SELECT doc_id, w, h, f,
               CAST(sum(r) AS BIGINT) AS fr_r,
               CAST(sum(g_) AS BIGINT) AS fr_g,
               CAST(sum(b) AS BIGINT) AS fr_b
        FROM px GROUP BY doc_id, w, h, f)
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(10 + doc_id % 7 AS INT) AS fps,
           CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(sum(fr_r) AS BIGINT) AS r_sum,
           CAST(sum(fr_g) AS BIGINT) AS g_sum,
           CAST(sum(fr_b) AS BIGINT) AS b_sum,
           CAST(sum((f + 1) * fr_r) AS BIGINT) AS frame_weighted_r
    FROM per_frame GROUP BY doc_id, w, h
    """,
    tags=("multimodal", "codec", "video"),
)
def mm_avi_frame_stats(spark, sf_dir):
    """REAL video frame sampling under the bit-level oracle — the
    modality that had only chunk-split plumbing is now a live codec:
    payloads are genuine uncompressed AVIs (RIFF with avih/strl
    headers, a movi LIST of bottom-up BGR DIB frame chunks — the same
    pixel layout the BMP codec pins — and the idx1 index), Spark walks
    the container STRUCTURALLY and decodes every 2nd frame only
    (skipped frames are never touched — the sampling economics the
    100 TB posture claims), and the oracle recomputes the sampled
    channel sums plus a frame-index-weighted checksum (pins frame
    ORDER through the chunk walk) straight from the rule. Stride
    padding, idx1 layout, and the reject paths are pinned by
    tests/test_avi_codec.py."""
    from river_spark.operators.avi import decode_avi_frame_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_avi_frame_stats(_avi_payloads(docs), "doc_id", "payload", every_k=2)
    return stats.filter(F.col("ok")).select(
        "doc_id", "width", "height", "fps", "n_sampled",
        "r_sum", "g_sum", "b_sum", "frame_weighted_r",
    )


@q(
    "mm_jpeg_gray_decode_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 2 + doc_id % 4 AS wb, 1 + doc_id % 3 AS hb
        FROM documents),
    blk AS (
        SELECT doc_id, wb, hb,
               (doc_id * 41 + 9 * g.p) % 256 AS yv
        FROM dims, UNNEST(generate_series(0, wb * hb - 1)) AS g(p)),
    f AS (
        SELECT doc_id, wb, hb,
          CAST(floor(((yv - 128) * 8589582400 + 536870912) / 1073741824.0) AS BIGINT) AS fy
        FROM blk),
    rc AS (
        SELECT doc_id, wb, hb,
          GREATEST(0, LEAST(255,
            CAST(floor((134212225 * (CAST(floor((2 * fy + 16) / 32.0) AS BIGINT) * 16)
                        + 536870912) / 1073741824.0) AS BIGINT) + 128)) AS ry
        FROM f)
    SELECT doc_id, CAST(8 * wb AS INT) AS width, CAST(8 * hb AS INT) AS height,
           CAST(64 * sum(ry) AS BIGINT) AS r_sum,
           CAST(64 * sum(ry) AS BIGINT) AS g_sum,
           CAST(64 * sum(ry) AS BIGINT) AS b_sum,
           CAST(64 * sum(ry) AS BIGINT) AS y_sum
    FROM rc GROUP BY doc_id, wb, hb
    """,
    tags=("multimodal", "codec", "image"),
)
def mm_jpeg_gray_decode_stats(spark, sf_dir):
    """Single-component (grayscale) baseline JPEG under the driver gate
    — the 1-plane SOF0/SOS layout real document scans use (one DQT, two
    DHT tables, no color conversion; the stats operator promotes Y to
    RGB). Same fixed-point closed form as mm_jpeg_decode_stats with a
    distinct generation rule: wb = 2 + d%4, hb = 1 + d%3,
    Y(p) = (d*41 + 9p) % 256."""
    from river_spark.operators.jpeg import decode_jpeg_rgb_stats, encode_jpeg

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                wb, hb = 2 + d % 4, 1 + d % 3
                p = np.arange(wb * hb, dtype=np.int64)
                yv = ((d * 41 + 9 * p) % 256).astype(np.uint8)
                plane = np.kron(yv.reshape(hb, wb), np.ones((8, 8), dtype=np.uint8))
                ids.append(d)
                payloads.append(encode_jpeg([plane]))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    docs = tbl(spark, sf_dir, "documents")
    payloads = _spread_ids(docs).mapInPandas(gen, schema=schema)
    stats = decode_jpeg_rgb_stats(payloads, "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "width", "height", "r_sum", "g_sum", "b_sum", "y_sum"
    )


# ---- Stereo-LPC FLAC rule (round 13 — the subset widening real FLAC
# corpora need): correlated stereo pair, SQL closed form:
#   n = 400 + (d % 4) * 100, rate = 16000 + (d % 2) * 8000
#   L(i) = ((d*17 + 5i) % 3001) - 1500 + (i % 13) * 2
#   R(i) = L(i) - (((d + i) % 257) - 128)
# (R tracks L with a small bounded difference, so the side channel is
# genuinely cheap and the stereo decorrelation is profitable; block
# size 128 gives every payload >= 4 frames so the cycled channel mode
# covers all four assignments — independent, left/side, right/side,
# mid/side — in every single payload)


def _flac_lpc_payloads(docs):
    """doc_id -> synthesized stereo-LPC FLAC payload (one mapInPandas
    pass). force_lpc routes every non-constant subframe through the
    LPC wire path (quantized Levinson-Durbin coefficients), the same
    honesty knob force_escape provides for the Rice escape code."""
    from river_spark.operators.flac import encode_flac

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 400 + (d % 4) * 100
                i = np.arange(n, dtype=np.int64)
                left = ((d * 17 + 5 * i) % 3001) - 1500 + (i % 13) * 2
                right = left - (((d + i) % 257) - 128)
                s = np.stack([left, right], axis=1).astype(np.int16)
                ids.append(d)
                payloads.append(
                    encode_flac(
                        16000 + (d % 2) * 8000,
                        s,
                        block_size=128,
                        lpc_orders=(2, 4, 8),
                        force_lpc=True,
                        channel_mode="cycle",
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(gen, schema=schema)


@q(
    "mm_flac_lpc_decode_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 400 + (doc_id % 4) * 100 AS n FROM documents),
    s AS (
        SELECT doc_id, n, g.i AS i,
               ((doc_id * 17 + 5 * g.i) % 3001) - 1500 + (g.i % 13) * 2 AS l
        FROM dims, UNNEST(generate_series(0, n - 1)) AS g(i)),
    lr AS (
        SELECT doc_id, n, i, l, l - (((doc_id + i) % 257) - 128) AS r FROM s)
    SELECT doc_id,
           CAST(16000 + (doc_id % 2) * 8000 AS INT) AS sample_rate,
           CAST(n AS BIGINT) AS n_samples,
           CAST(sum(l) AS BIGINT) AS left_sum,
           CAST(sum(r) AS BIGINT) AS right_sum,
           CAST(sum(abs(l)) AS BIGINT) AS left_abs_sum,
           CAST(sum(abs(r)) AS BIGINT) AS right_abs_sum,
           CAST(sum((i % 997 + 1) * l) AS BIGINT) AS left_pw_sum,
           CAST(sum((i % 997 + 1) * r) AS BIGINT) AS right_pw_sum
    FROM lr GROUP BY doc_id, n
    """,
    tags=("multimodal", "codec", "audio"),
)
def mm_flac_lpc_decode_stats(spark, sf_dir):
    """REAL stereo-LPC FLAC encode→decode round trip under the
    bit-level oracle — the round-13 widening of the FLAC subset to the
    two features real corpora are overwhelmingly made of. Payloads are
    genuine FLAC streams whose every non-constant subframe is LPC
    (per-block Levinson-Durbin, coefficients quantized to the wire's
    (precision, shift) pair, residuals against the INTEGER prediction)
    and whose frames CYCLE through all four stereo channel assignments
    — independent, left/side, right/side, mid/side, the side channel at
    17 bits per the spec — so one payload exercises every
    reconstruction path. Spark decodes with
    operators/flac.decode_flac_stereo_stats (CRC-8/CRC-16 verified,
    integer LPC reconstruction, channel de-correlation); losslessness
    makes the oracle a pure restatement of the generation rule, with
    per-channel position-weighted checksums pinning sample order AND
    channel identity (a swapped L/R or a mid/side off-by-one parity bug
    flips them). Subset rejects (negative LPC shift, precision escape
    code) are pinned by tests/test_flac_codec.py."""
    from river_spark.operators.flac import decode_flac_stereo_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_flac_stereo_stats(_flac_lpc_payloads(docs), "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "sample_rate", "n_samples",
        "left_sum", "right_sum", "left_abs_sum", "right_abs_sum",
        "left_pw_sum", "right_pw_sum",
    )


# ---- MJPEG AVI rule (round 13 — the compressed-video layout): every
# frame a constant-block baseline JPEG (the DC-only closed form the
# JPEG oracle mirrors), varying per frame:
#   nf = 3 + d % 4, wb = 2 + d % 3, hb = 2 + d % 2, fps = 10 + d % 7
#   frame f, block p: Y = (d*31 + 11f + 5p) % 256,
#                     Cb = (d*17 + 13f + 3p) % 256,
#                     Cr = (d*23 + 19f + 7p) % 256
# The query samples every 2nd frame; skipped frames never enter the
# entropy decoder.


def _mjpeg_payloads(docs):
    """doc_id -> synthesized MJPEG AVI (one mapInPandas pass): each
    '00dc' chunk is a complete baseline JPEG (4:4:4, flat quant,
    Annex-K Huffman, restart every 2 MCUs) inside the real RIFF
    container with biCompression 'MJPG'."""
    from river_spark.operators.avi import encode_avi_mjpeg
    from river_spark.operators.jpeg import encode_jpeg

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nf = 3 + d % 4
                wb, hb = 2 + d % 3, 2 + d % 2
                p = np.arange(wb * hb, dtype=np.int64)
                frames = []
                for f in range(nf):
                    planes = [
                        np.kron(
                            (((d * a + b * f + c * p) % 256)
                             .astype(np.uint8).reshape(hb, wb)),
                            np.ones((8, 8), dtype=np.uint8),
                        )
                        for a, b, c in ((31, 11, 5), (17, 13, 3), (23, 19, 7))
                    ]
                    frames.append(encode_jpeg(planes, restart_interval=2))
                ids.append(d)
                payloads.append(
                    encode_avi_mjpeg(frames, 8 * wb, 8 * hb, fps=10 + d % 7)
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(gen, schema=schema)


@q(
    "mm_mjpeg_frame_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 3 + doc_id % 4 AS nf,
               2 + doc_id % 3 AS wb, 2 + doc_id % 2 AS hb
        FROM documents),
    fr AS (  -- every 2nd frame, the operator's sampling stride
        SELECT doc_id, nf, wb, hb, g.f AS f
        FROM dims, UNNEST(generate_series(0, nf - 1)) AS g(f)
        WHERE g.f % 2 = 0),
    blk AS (
        SELECT doc_id, nf, wb, hb, f,
               (doc_id * 31 + 11 * f + 5 * g.p) % 256 AS yv,
               (doc_id * 17 + 13 * f + 3 * g.p) % 256 AS cbv,
               (doc_id * 23 + 19 * f + 7 * g.p) % 256 AS crv
        FROM fr, UNNEST(generate_series(0, wb * hb - 1)) AS g(p)),
    -- fixed-point forward DCT DC term: F = (n * (8*11585)^2 + 2^29) >> 30
    fdc AS (
        SELECT doc_id, nf, wb, hb, f,
          CAST(floor(((yv - 128) * 8589582400 + 536870912) / 1073741824.0) AS BIGINT) AS fy,
          CAST(floor(((cbv - 128) * 8589582400 + 536870912) / 1073741824.0) AS BIGINT) AS fcb,
          CAST(floor(((crv - 128) * 8589582400 + 536870912) / 1073741824.0) AS BIGINT) AS fcr
        FROM blk),
    -- round-half-up quantization, steps 16 (luma) / 17 (chroma)
    qc AS (
        SELECT doc_id, nf, wb, hb, f,
          CAST(floor((2 * fy + 16) / 32.0) AS BIGINT) AS qy,
          CAST(floor((2 * fcb + 17) / 34.0) AS BIGINT) AS qcb,
          CAST(floor((2 * fcr + 17) / 34.0) AS BIGINT) AS qcr
        FROM fdc),
    -- dequant + fixed-point IDCT of the DC-only block: 11585^2 * level
    rc AS (
        SELECT doc_id, nf, wb, hb, f,
          GREATEST(0, LEAST(255, CAST(floor((134212225 * qy * 16 + 536870912) / 1073741824.0) AS BIGINT) + 128)) AS ry,
          GREATEST(0, LEAST(255, CAST(floor((134212225 * qcb * 17 + 536870912) / 1073741824.0) AS BIGINT) + 128)) AS rcb,
          GREATEST(0, LEAST(255, CAST(floor((134212225 * qcr * 17 + 536870912) / 1073741824.0) AS BIGINT) + 128)) AS rcr
        FROM qc),
    -- pinned integer JFIF YCbCr->RGB (scale 2^16, +2^15 rounding)
    rgb AS (
        SELECT doc_id, nf, wb, hb, f, ry,
          GREATEST(0, LEAST(255, ry + CAST(floor((91881 * (rcr - 128) + 32768) / 65536.0) AS BIGINT))) AS r,
          GREATEST(0, LEAST(255, ry - CAST(floor((46802 * (rcr - 128) + 22554 * (rcb - 128) + 32768) / 65536.0) AS BIGINT))) AS g_,
          GREATEST(0, LEAST(255, ry + CAST(floor((116130 * (rcb - 128) + 32768) / 65536.0) AS BIGINT))) AS b
        FROM rc)
    SELECT doc_id,
           CAST(8 * wb AS INT) AS width,
           CAST(8 * hb AS INT) AS height,
           CAST(10 + doc_id % 7 AS INT) AS fps,
           CAST((nf + 1) // 2 AS BIGINT) AS n_sampled,
           CAST(64 * sum(r) AS BIGINT) AS r_sum,
           CAST(64 * sum(g_) AS BIGINT) AS g_sum,
           CAST(64 * sum(b) AS BIGINT) AS b_sum,
           CAST(64 * sum((f + 1) * ry) AS BIGINT) AS frame_weighted_y
    FROM rgb GROUP BY doc_id, nf, wb, hb
    """,
    tags=("multimodal", "codec", "video"),
)
def mm_mjpeg_frame_stats(spark, sf_dir):
    """REAL compressed-video decode under the bit-level oracle: MJPEG
    AVI — the round-13 widening of the video modality from uncompressed
    DIB chunks to the dominant compressed layout, composing the two
    proven codecs (RIFF/AVI container walk x baseline JPEG fixed-point
    pipeline). Payloads are genuine MJPEG AVIs: biCompression 'MJPG',
    every '00dc' chunk a complete T.81 baseline JPEG with restart
    markers. Spark samples every 2nd frame (skipped frames never enter
    the Huffman decoder — the chunk walk advances by length), decodes
    with operators/jpeg.decode_jpeg, and emits exact integer RGB sums
    plus a frame-index-weighted Y checksum pinning frame order. The
    oracle mirrors the pinned integer kernels per (doc, frame) — the
    same DC-only closed form mm_jpeg_decode_stats proves, extended by
    the frame dimension and the sampling stride — never seeing a byte.
    Container lies (frame-count, size mismatch) and non-MJPG
    compression are reject-tested in tests/test_avi_codec.py."""
    from river_spark.operators.avi import decode_avi_mjpeg_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_avi_mjpeg_stats(_mjpeg_payloads(docs), "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "width", "height", "fps", "n_sampled",
        "r_sum", "g_sum", "b_sum", "frame_weighted_y",
    )


# ---- Progressive JPEG rule (round 13): same constant-block closed form
# as baseline (progressive changes only the TRANSMISSION ORDER of the
# same quantized coefficients), different constants:
#   wb = 2 + d % 3, hb = 2 + d % 2
#   block p: Y = (d*29 + 5p) % 256, Cb = (d*19 + 3p) % 256,
#            Cr = (d*13 + 7p) % 256


def _jpeg_prog_payloads(docs):
    """doc_id -> synthesized PROGRESSIVE JPEG payload (one mapInPandas
    pass): SOF2, the canonical 8-scan simple-progression script — DC
    first at Al=1, per-component AC 1-63 at Al=1, DC refinement,
    per-component AC refinement with correction bits."""
    from river_spark.operators.jpeg import encode_jpeg_progressive

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                wb, hb = 2 + d % 3, 2 + d % 2
                p = np.arange(wb * hb, dtype=np.int64)
                planes = [
                    np.kron(
                        (((d * a + c * p) % 256).astype(np.uint8).reshape(hb, wb)),
                        np.ones((8, 8), dtype=np.uint8),
                    )
                    for a, c in ((29, 5), (19, 3), (13, 7))
                ]
                ids.append(d)
                payloads.append(encode_jpeg_progressive(planes))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(gen, schema=schema)


@q(
    "mm_jpeg_prog_decode_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 2 + doc_id % 3 AS wb, 2 + doc_id % 2 AS hb
        FROM documents),
    blk AS (
        SELECT doc_id, wb, hb,
               (doc_id * 29 + 5 * g.p) % 256 AS yv,
               (doc_id * 19 + 3 * g.p) % 256 AS cbv,
               (doc_id * 13 + 7 * g.p) % 256 AS crv
        FROM dims, UNNEST(generate_series(0, wb * hb - 1)) AS g(p)),
    -- fixed-point forward DCT DC term: F = (n * (8*11585)^2 + 2^29) >> 30
    f AS (
        SELECT doc_id, wb, hb,
          CAST(floor(((yv - 128) * 8589582400 + 536870912) / 1073741824.0) AS BIGINT) AS fy,
          CAST(floor(((cbv - 128) * 8589582400 + 536870912) / 1073741824.0) AS BIGINT) AS fcb,
          CAST(floor(((crv - 128) * 8589582400 + 536870912) / 1073741824.0) AS BIGINT) AS fcr
        FROM blk),
    -- round-half-up quantization, steps 16 (luma) / 17 (chroma)
    qc AS (
        SELECT doc_id, wb, hb,
          CAST(floor((2 * fy + 16) / 32.0) AS BIGINT) AS qy,
          CAST(floor((2 * fcb + 17) / 34.0) AS BIGINT) AS qcb,
          CAST(floor((2 * fcr + 17) / 34.0) AS BIGINT) AS qcr
        FROM f),
    -- dequant + fixed-point IDCT of the DC-only block: 11585^2 * level
    rc AS (
        SELECT doc_id, wb, hb,
          GREATEST(0, LEAST(255, CAST(floor((134212225 * qy * 16 + 536870912) / 1073741824.0) AS BIGINT) + 128)) AS ry,
          GREATEST(0, LEAST(255, CAST(floor((134212225 * qcb * 17 + 536870912) / 1073741824.0) AS BIGINT) + 128)) AS rcb,
          GREATEST(0, LEAST(255, CAST(floor((134212225 * qcr * 17 + 536870912) / 1073741824.0) AS BIGINT) + 128)) AS rcr
        FROM qc),
    -- pinned integer JFIF YCbCr->RGB (scale 2^16, +2^15 rounding)
    rgb AS (
        SELECT doc_id, wb, hb, ry,
          GREATEST(0, LEAST(255, ry + CAST(floor((91881 * (rcr - 128) + 32768) / 65536.0) AS BIGINT))) AS r,
          GREATEST(0, LEAST(255, ry - CAST(floor((46802 * (rcr - 128) + 22554 * (rcb - 128) + 32768) / 65536.0) AS BIGINT))) AS g_,
          GREATEST(0, LEAST(255, ry + CAST(floor((116130 * (rcb - 128) + 32768) / 65536.0) AS BIGINT))) AS b
        FROM rc)
    SELECT doc_id, CAST(8 * wb AS INT) AS width, CAST(8 * hb AS INT) AS height,
           CAST(64 * sum(r) AS BIGINT) AS r_sum,
           CAST(64 * sum(g_) AS BIGINT) AS g_sum,
           CAST(64 * sum(b) AS BIGINT) AS b_sum,
           CAST(64 * sum(ry) AS BIGINT) AS y_sum
    FROM rgb GROUP BY doc_id, wb, hb
    """,
    tags=("multimodal", "codec", "image"),
)
def mm_jpeg_prog_decode_stats(spark, sf_dir):
    """PROGRESSIVE JPEG (SOF2) encode→decode round trip under the
    bit-level oracle — the last dominant real-corpus JPEG mode the
    family lacked (baseline 4:4:4, 4:2:0, grayscale landed in r12).
    Payloads carry the canonical 8-scan simple-progression script: DC
    first scan at Al=1, per-component AC 1-63 first scans, DC
    refinement raw bits, per-component AC refinement with correction
    bits — spectral selection AND successive approximation both on the
    wire. Spark decodes with the full progressive path
    (operators/jpeg._decode_progressive: coefficient buffers across
    scans, EOBn run decoding, G.1.2.3 refinement); because progressive
    mode re-orders the SAME quantized coefficients, decode equals the
    baseline decode bit-for-bit (pinned by tests on random planes) and
    the oracle mirrors the identical DC-only closed form with this
    fixture's constants. Foreign-file EOBn>0 runs are pinned by a
    hand-built bitstream test."""
    from river_spark.operators.jpeg import decode_jpeg_rgb_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_jpeg_rgb_stats(_jpeg_prog_payloads(docs), "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "width", "height", "r_sum", "g_sum", "b_sum", "y_sum"
    )


# ---- TIFF LZW+predictor rule (round 13): RGB with runs of 4 so the
# horizontal-differencing predictor and the LZW dictionary both get
# real work:
#   w = 16 + d % 5, h = 10 + d % 3
#   channel c of pixel p (row-major): v = (d*41 + 7*(p div 4) + 11*c) % 256


def _tiff_lzw_payloads(docs):
    """doc_id -> synthesized LZW+Predictor-2 RGB TIFF (one mapInPandas
    pass): little-endian, strips of 3 rows with a partial final strip
    for 2 of every 3 docs."""
    from river_spark.operators.tiff import encode_tiff

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 16 + d % 5, 10 + d % 3
                p = np.arange(w * h, dtype=np.int64)
                c = np.arange(3, dtype=np.int64)
                px = ((d * 41 + 7 * (p[:, None] // 4) + 11 * c[None, :]) % 256)
                img = px.astype(np.uint8).reshape(h, w, 3)
                ids.append(d)
                payloads.append(
                    encode_tiff(img, rows_per_strip=3, compression=5, predictor=2)
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(gen, schema=schema)


@q(
    "mm_tiff_lzw_decode_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 16 + doc_id % 5 AS w, 10 + doc_id % 3 AS h
        FROM documents),
    px AS (
        SELECT doc_id, w, h, g.p AS p,
               (doc_id * 41 + 7 * (g.p // 4)) % 256 AS r,
               (doc_id * 41 + 7 * (g.p // 4) + 11) % 256 AS gr,
               (doc_id * 41 + 7 * (g.p // 4) + 22) % 256 AS b
        FROM dims, UNNEST(generate_series(0, w * h - 1)) AS g(p))
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(sum(r) AS BIGINT) AS r_sum,
           CAST(sum(gr) AS BIGINT) AS g_sum,
           CAST(sum(b) AS BIGINT) AS b_sum,
           CAST(sum((p % 997 + 1) * r) AS BIGINT) AS pos_weighted_r
    FROM px GROUP BY doc_id, w, h
    """,
    tags=("multimodal", "codec", "image"),
)
def mm_tiff_lzw_decode_stats(spark, sf_dir):
    """TIFF LZW + horizontal-differencing predictor under the bit-level
    oracle — the round-13 widening of the TIFF subset to the entropy
    layer real scanned/archival corpora ship (PackBits landed r12; LZW
    is TIFF 6.0 §13 with MSB-first packing, the EarlyChange=1 width
    ladder, and ClearCode restarts; Predictor 2 is §14). Spark decodes
    with operators/tiff.decode_tiff (IFD walk, strip reassembly, LZW
    expansion, per-row cumulative un-differencing); losslessness makes
    the oracle a pure restatement of the generation rule, the
    position-weighted checksum pinning pixel order through the
    strip/predictor reassembly. Width-ladder boundaries (9->12 bits),
    dictionary restarts, and reject paths are pinned by
    tests/test_tiff_codec.py."""
    from river_spark.operators.tiff import decode_tiff_rgb_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_tiff_rgb_stats(_tiff_lzw_payloads(docs), "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "width", "height", "r_sum", "g_sum", "b_sum", "pos_weighted_r"
    )


# ---- Interleaved A/V AVI rule (round 13 — multi-stream RIFF):
#   video: nf = 3 + d % 4, w = 8 + 4*(d % 2), h = 8
#          frame f, channel byte j (row-major RGB): (d*37 + 89f + j) % 256
#          (red channel = bytes j = 3p); query samples every 2nd frame
#   audio: n_a = 200 + (d % 5) * 50, rate = 8000 + (d % 3) * 4000
#          s(i) = ((d*7 + 3i) % 2001) - 1000


def _avi_av_payloads(docs):
    """doc_id -> synthesized interleaved audio+video AVI (one
    mapInPandas pass): two strl lists (vids DIB + auds PCM16), each
    '00db' frame chunk followed by its '01wb' audio slice."""
    from river_spark.operators.avi import encode_avi_av

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nf = 3 + d % 4
                w, h = 8 + 4 * (d % 2), 8
                j = np.arange(3 * w * h, dtype=np.int64)
                frames = [
                    ((d * 37 + 89 * f + j) % 256).astype(np.uint8).reshape(h, w, 3)
                    for f in range(nf)
                ]
                na = 200 + (d % 5) * 50
                i = np.arange(na, dtype=np.int64)
                audio = (((d * 7 + 3 * i) % 2001) - 1000).astype(np.int16)
                ids.append(d)
                payloads.append(
                    encode_avi_av(frames, audio, fps=10 + d % 7,
                                  sample_rate=8000 + (d % 3) * 4000)
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(gen, schema=schema)


@q(
    "mm_avi_av_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 3 + doc_id % 4 AS nf,
               8 + 4 * (doc_id % 2) AS w, 8 AS h,
               200 + (doc_id % 5) * 50 AS na
        FROM documents),
    vid AS (  -- every 2nd frame, red channel = byte j = 3p
        SELECT doc_id,
               CAST(sum((doc_id * 37 + 89 * f.f + 3 * p.p) % 256) AS BIGINT) AS r_sum,
               CAST(sum((f.f + 1) * ((doc_id * 37 + 89 * f.f + 3 * p.p) % 256)) AS BIGINT) AS frame_weighted_r
        FROM dims,
             UNNEST(generate_series(0, nf - 1)) AS f(f),
             UNNEST(generate_series(0, w * h - 1)) AS p(p)
        WHERE f.f % 2 = 0
        GROUP BY doc_id),
    aud AS (
        SELECT doc_id,
               CAST(sum(((doc_id * 7 + 3 * g.i) % 2001) - 1000) AS BIGINT) AS audio_sum,
               CAST(sum((g.i % 997 + 1) * (((doc_id * 7 + 3 * g.i) % 2001) - 1000)) AS BIGINT) AS audio_pw_sum
        FROM dims, UNNEST(generate_series(0, na - 1)) AS g(i)
        GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
           CAST(10 + d.doc_id % 7 AS INT) AS fps,
           CAST((d.nf + 1) // 2 AS BIGINT) AS n_sampled,
           v.r_sum, v.frame_weighted_r,
           CAST(8000 + (d.doc_id % 3) * 4000 AS INT) AS sample_rate,
           CAST(d.na AS BIGINT) AS n_audio,
           a.audio_sum, a.audio_pw_sum
    FROM dims d JOIN vid v USING (doc_id) JOIN aud a USING (doc_id)
    """,
    tags=("multimodal", "codec", "video", "audio"),
)
def mm_avi_av_stats(spark, sf_dir):
    """Interleaved AUDIO+VIDEO AVI under the bit-level oracle — the
    round-13 widening of the container from single-stream to the
    multi-stream layout real capture files use: two strl headers (vids
    DIB + auds PCM16 WAVEFORMATEX), each frame's '00db' chunk followed
    by its '01wb' audio slice in the movi LIST. ONE container walk
    yields both tracks: video sampled every 2nd frame (skipped frames
    untouched, '01wb' chunks skipped by length during the frame walk)
    and the audio track reassembled across its interleaved slices in
    order — the position-weighted audio checksum pins that reassembly
    ORDER, the frame-weighted red checksum pins the video's. Lossless
    on both tracks, so the oracle restates both generation rules.
    Stream-type dispatch (vids/auds strf parsing) and reject paths are
    pinned by tests/test_avi_codec.py."""
    from river_spark.operators.avi import decode_avi_av_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_avi_av_stats(_avi_av_payloads(docs), "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "width", "height", "fps", "n_sampled",
        "r_sum", "frame_weighted_r",
        "sample_rate", "n_audio", "audio_sum", "audio_pw_sum",
    )


# ---- Partitioned-Rice FLAC rule (round 14 — the residual layout real
# encoders emit by default): mono transient-heavy signal with 2 wasted
# bits, SQL closed form:
#   n = 512 + (d % 3) * 256, rate = 8000 + (d % 3) * 4000
#   raw(i) = (d*7 + 11i) % 2048 - 1024   when i % 64 < 4   (spike)
#          = (d*13 + 3i) % 31 - 15       otherwise          (quiet)
#   s(i) = 4 * raw(i)
# (spikes every 64 samples make one Rice k per block a bad compromise,
# so the exact-bit-count search genuinely picks partition orders > 0 —
# tests/test_flac_codec.py pins the compression win — and the shared
# factor 4 puts 2 wasted bits on every subframe header; variable
# blocking cycles block sizes 256/192/128 with starting-sample frame
# numbers; every size divides cleanly for some orders and the search
# skips the rest)


def _flac_partitioned_payloads(docs):
    """doc_id -> synthesized partitioned-Rice FLAC payload (one
    mapInPandas pass): partition orders 0-4 searched by exact bit
    count, wasted-bits detection on, mixed FIXED/LPC predictor
    search."""
    from river_spark.operators.flac import encode_flac

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 512 + (d % 3) * 256
                i = np.arange(n, dtype=np.int64)
                quiet = ((d * 13 + 3 * i) % 31) - 15
                spike = ((d * 7 + 11 * i) % 2048) - 1024
                s = (4 * np.where(i % 64 < 4, spike, quiet)).astype(np.int16)
                ids.append(d)
                payloads.append(
                    encode_flac(
                        8000 + (d % 3) * 4000,
                        s,
                        block_size=256,
                        lpc_orders=(2, 4, 8),
                        partition_orders=(0, 1, 2, 3, 4),
                        detect_wasted=True,
                        variable_blocking=True,
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        # the synth+decode stages are CPU-bound pure-Python bit work;
        # a tiny sf dir reads as ONE parquet partition, which would
        # serialize them on a single core — spread doc_ids first (the
        # exchange moves only a long column; at 100 TB the source is
        # already many partitions and this hash co-locates by doc)
        _spread_ids(docs).mapInPandas(gen, schema=schema)
    )


@q(
    "mm_flac_partitioned_decode_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 512 + (doc_id % 3) * 256 AS n FROM documents),
    s AS (
        SELECT doc_id, n, g.i AS i,
               4 * (CASE WHEN g.i % 64 < 4
                    THEN ((doc_id * 7 + 11 * g.i) % 2048) - 1024
                    ELSE ((doc_id * 13 + 3 * g.i) % 31) - 15 END) AS v
        FROM dims, UNNEST(generate_series(0, n - 1)) AS g(i))
    SELECT doc_id,
           CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
           CAST(n AS BIGINT) AS n_samples,
           CAST(sum(v) AS BIGINT) AS sample_sum,
           CAST(sum(abs(v)) AS BIGINT) AS abs_sum,
           CAST(sum((i % 997 + 1) * v) AS BIGINT) AS pos_weighted_sum
    FROM s GROUP BY doc_id, n
    """,
    tags=("multimodal", "codec", "audio"),
)
def mm_flac_partitioned_decode_stats(spark, sf_dir):
    """Partitioned-Rice FLAC under the bit-level oracle — the round-14
    widening to the residual layout real encoders emit by default:
    every subframe's residual splits into 2^po partitions (po searched
    0-4 by exact bit count), each partition carrying its OWN 4-bit Rice
    parameter, and every subframe header carries 2 wasted bits (the
    whole signal shares a factor of 4, so warmup, prediction, and
    residuals all run at 14 bits with the decoder shifting the
    reconstruction left). The transient generation rule — loud spikes
    every 64 samples over a quiet carrier — is exactly the waveform
    shape partitioning exists for, so the search genuinely puts orders
    > 0 on the wire (tests/test_flac_codec.py pins the compression win
    and the reject paths: non-dividing partition counts, starved first
    partition, wasted bits exceeding the sample width). Spark decodes
    with operators/flac.decode_flac_stats (CRC-8/CRC-16 verified);
    losslessness makes the oracle a pure restatement of the generation
    rule, the position-weighted checksum pinning sample order across
    partition boundaries."""
    from river_spark.operators.flac import decode_flac_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_flac_stats(
        _flac_partitioned_payloads(docs), "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "sample_rate", "n_samples",
        "sample_sum", "abs_sum", "pos_weighted_sum",
    )


# ---- Tiled TIFF rule (round 14 — TIFF 6.0 §15, the layout
# scanned/archival and geo TIFFs use): RGB, 16x16 tiles over LZW +
# Predictor 2, dimensions chosen so BOTH edges always carry partial
# (zero-padded) tiles:
#   w = 33 + (d % 4) * 8, h = 17 + (d % 3) * 8
#   pixel p (row-major): r = (d*29 + 5p) % 256, g = r+17 mod, b = r+34 mod


def _tiff_tiled_payloads(docs):
    """doc_id -> synthesized tiled RGB TIFF payload (one mapInPandas
    pass): 16x16 tiles, LZW entropy, horizontal-differencing predictor
    — the §15 layout over the §13/§14 machinery the strip walker
    already owns."""
    from river_spark.operators.tiff import encode_tiff

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 33 + (d % 4) * 8, 17 + (d % 3) * 8
                p = np.arange(w * h, dtype=np.int64)
                r = (d * 29 + 5 * p) % 256
                img = np.stack([r, (r + 17) % 256, (r + 34) % 256], axis=1)
                img = img.astype(np.uint8).reshape(h, w, 3)
                ids.append(d)
                payloads.append(
                    encode_tiff(img, compression=5, predictor=2,
                                tile_size=(16, 16))
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        # the synth+decode stages are CPU-bound pure-Python bit work;
        # a tiny sf dir reads as ONE parquet partition, which would
        # serialize them on a single core — spread doc_ids first (the
        # exchange moves only a long column; at 100 TB the source is
        # already many partitions and this hash co-locates by doc)
        _spread_ids(docs).mapInPandas(gen, schema=schema)
    )


@q(
    "mm_tiff_tiled_decode_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 33 + (doc_id % 4) * 8 AS w, 17 + (doc_id % 3) * 8 AS h
        FROM documents),
    px AS (
        SELECT doc_id, w, h, g.p AS p,
               (doc_id * 29 + 5 * g.p) % 256 AS r
        FROM dims, UNNEST(generate_series(0, w * h - 1)) AS g(p))
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(sum(r) AS BIGINT) AS r_sum,
           CAST(sum((r + 17) % 256) AS BIGINT) AS g_sum,
           CAST(sum((r + 34) % 256) AS BIGINT) AS b_sum,
           CAST(sum((p % 997 + 1) * r) AS BIGINT) AS pos_weighted_r
    FROM px GROUP BY doc_id, w, h
    """,
    tags=("multimodal", "codec", "image"),
)
def mm_tiff_tiled_decode_stats(spark, sf_dir):
    """Tiled TIFF under the bit-level oracle — the round-14 widening of
    the TIFF subset to the §15 layout scanned/archival and geo TIFFs
    use: TileWidth/TileLength 16x16 (spec-mandated multiples of 16),
    TileOffsets/TileByteCounts reassembly left-to-right then down, and
    — because every generated width and height is odd-sized against the
    tile grid — partial edge tiles on BOTH axes, zero-padded to full
    tile size on the wire and cropped on reassembly. The entropy layer
    is the §13/§14 pairing already gated on strips (LZW + Predictor 2,
    the predictor differencing within each TILE's rows, not the image
    rows). Spark decodes with operators/tiff.decode_tiff_rgb_stats;
    losslessness makes the oracle a pure restatement of the generation
    rule, the position-weighted checksum pinning pixel order through
    the tile-grid reassembly (a transposed tile index, a padding leak,
    or a per-tile predictor reset bug lands as an integer mismatch).
    Tile reject paths (non-multiple-of-16 dimensions, grid/count
    mismatch, mixed strip+tile tags) are pinned by
    tests/test_tiff_codec.py."""
    from river_spark.operators.tiff import decode_tiff_rgb_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_tiff_rgb_stats(_tiff_tiled_payloads(docs), "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "width", "height", "r_sum", "g_sum", "b_sum", "pos_weighted_r"
    )


# ---- Multichannel 24-bit FLAC rule (round 14, second widening — the
# other two bit depths real corpora carry plus the surround layouts):
#   nch = 3 + d % 4 (3..6 channels), n = 256 + (d % 2) * 128
#   rate = 24000 + (d % 4) * 8000, bit depth 24
#   v(c,i) = ((d*19 + 7c + 5i) % 16000001) - 8000000 + ((i + c) % 29) * 64
# (the big negative base exercises genuine 24-bit magnitudes; the
# (i+c)%29 ripple keeps residuals non-constant so Rice actually codes)


def _flac_multichannel_payloads(docs):
    """doc_id -> synthesized multichannel FLAC payload at bit depth
    12/16/20/24 cycling by doc_id (one mapInPandas pass): channel code
    nch-1, sample-size codes 010/100/101/110, independent subframes,
    partitioned Rice on the wire."""
    from river_spark.operators.flac import encode_flac

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nch = 3 + d % 4
                n = 256 + (d % 2) * 128
                bd = (12, 16, 20, 24)[d % 4]
                m = (1 << bd) - 256
                i = np.arange(n, dtype=np.int64)
                chans = [
                    ((d * 19 + 7 * c + 5 * i) % m) - m // 2
                    + ((i + c) % 29) * 2
                    for c in range(nch)
                ]
                s = np.stack(chans, axis=1)
                ids.append(d)
                payloads.append(
                    encode_flac(
                        24000 + (d % 4) * 8000,
                        s,
                        block_size=128,
                        bit_depth=bd,
                        lpc_orders=(2, 4),
                        partition_orders=(0, 1, 2, 3),
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        # the synth+decode stages are CPU-bound pure-Python bit work;
        # a tiny sf dir reads as ONE parquet partition, which would
        # serialize them on a single core — spread doc_ids first (the
        # exchange moves only a long column; at 100 TB the source is
        # already many partitions and this hash co-locates by doc)
        _spread_ids(docs).mapInPandas(gen, schema=schema)
    )


@q(
    "mm_flac_multichannel_decode_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 3 + doc_id % 4 AS nch, 256 + (doc_id % 2) * 128 AS n,
               CASE doc_id % 4 WHEN 0 THEN 3840 WHEN 1 THEN 65280
                               WHEN 2 THEN 1048320 ELSE 16776960 END AS m
        FROM documents),
    s AS (
        SELECT doc_id, nch, n, c.c AS c, g.i AS i,
               ((doc_id * 19 + 7 * c.c + 5 * g.i) % m) - m // 2
               + ((g.i + c.c) % 29) * 2 AS v
        FROM dims,
             UNNEST(generate_series(0, nch - 1)) AS c(c),
             UNNEST(generate_series(0, n - 1)) AS g(i))
    SELECT doc_id,
           CAST(24000 + (doc_id % 4) * 8000 AS INT) AS sample_rate,
           CAST(n AS BIGINT) AS n_samples,
           CAST(nch AS INT) AS n_channels,
           CAST(sum(v) AS BIGINT) AS sample_sum,
           CAST(sum(abs(v)) AS BIGINT) AS abs_sum,
           CAST(sum((i % 997 + 1) * (c + 1) * v) AS BIGINT) AS chpos_weighted_sum
    FROM s GROUP BY doc_id, nch, n
    """,
    tags=("multimodal", "codec", "audio"),
)
def mm_flac_multichannel_decode_stats(spark, sf_dir):
    """Multichannel FLAC across the FULL bit-depth matrix under the
    bit-level oracle — round 14 brought 3-6 independent channels (spec
    channel code nch-1) at 24 bits; round 15 (r14 verdict #6) cycles
    the depth 12/16/20/24 by doc_id (sample-size codes 010/100/101/110)
    with per-depth magnitudes filling the representable range, so the
    non-byte-aligned 12/20 widths exercise the bit-reader's unaligned
    path on every sample while partitioned Rice residuals stay on the
    wire. Spark decodes with
    operators/flac.decode_flac_multichannel_stats (CRC-verified);
    losslessness makes the oracle a pure restatement of the generation
    rule, and the checksum weights every sample by BOTH channel index
    and position, so a swapped or dropped channel, a truncated bit
    depth, or a frame-order bug lands as an integer mismatch. Wire pins
    (sample-size code on the frame header, channel code nibble,
    STREAMINFO/frame bps agreement) and reject paths (9 channels, bit
    depth 32, range overflow) are in tests/test_flac_codec.py."""
    from river_spark.operators.flac import decode_flac_multichannel_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_flac_multichannel_stats(
        _flac_multichannel_payloads(docs), "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "sample_rate", "n_samples", "n_channels",
        "sample_sum", "abs_sum", "chpos_weighted_sum",
    )


# ---- 4:2:2 JPEG rule (round 14 — the camera/video horizontal-only
# subsampling): MCU 16x8 = two luma blocks + one Cb + one Cr at half
# horizontal resolution.
#   wm = 1 + d % 3 (MCUs across), hm = 1 + d % 2 (MCUs down)
#   luma block s (0..1) of MCU p: Y = (d*29 + 5*(2p+s)) % 256
#   Cb = (d*19 + 3p) % 256, Cr = (d*37 + 7p) % 256


def _jpeg422_payloads(docs):
    """doc_id -> synthesized 4:2:2 baseline JPEG (one mapInPandas
    pass); restart markers every 2 MCUs."""
    from river_spark.operators.jpeg import encode_jpeg_422

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                wm, hm = 1 + d % 3, 1 + d % 2
                y = np.zeros((8 * hm, 16 * wm), dtype=np.uint8)
                cb = np.zeros((8 * hm, 8 * wm), dtype=np.uint8)
                cr = np.zeros((8 * hm, 8 * wm), dtype=np.uint8)
                for p in range(wm * hm):
                    my, mx = divmod(p, wm)
                    for s in range(2):
                        y[
                            my * 8 : my * 8 + 8,
                            mx * 16 + s * 8 : mx * 16 + s * 8 + 8,
                        ] = (d * 29 + 5 * (2 * p + s)) % 256
                    cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = (d * 19 + 3 * p) % 256
                    cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = (d * 37 + 7 * p) % 256
                ids.append(d)
                payloads.append(encode_jpeg_422(y, cb, cr, restart_interval=2))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(gen, schema=schema)


@q(
    "mm_jpeg422_decode_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 1 + doc_id % 3 AS wm, 1 + doc_id % 2 AS hm
        FROM documents),
    blk AS (
        SELECT doc_id, wm, hm,
               (doc_id * 29 + 5 * (2 * g.p + s.s)) % 256 AS yv,
               (doc_id * 19 + 3 * g.p) % 256 AS cbv,
               (doc_id * 37 + 7 * g.p) % 256 AS crv
        FROM dims,
             UNNEST(generate_series(0, wm * hm - 1)) AS g(p),
             UNNEST(generate_series(0, 1)) AS s(s)),
    f AS (
        SELECT doc_id, wm, hm,
          CAST(floor(((yv - 128) * 8589582400 + 536870912) / 1073741824.0) AS BIGINT) AS fy,
          CAST(floor(((cbv - 128) * 8589582400 + 536870912) / 1073741824.0) AS BIGINT) AS fcb,
          CAST(floor(((crv - 128) * 8589582400 + 536870912) / 1073741824.0) AS BIGINT) AS fcr
        FROM blk),
    qc AS (
        SELECT doc_id, wm, hm,
          CAST(floor((2 * fy + 16) / 32.0) AS BIGINT) AS qy,
          CAST(floor((2 * fcb + 17) / 34.0) AS BIGINT) AS qcb,
          CAST(floor((2 * fcr + 17) / 34.0) AS BIGINT) AS qcr
        FROM f),
    rc AS (
        SELECT doc_id, wm, hm,
          GREATEST(0, LEAST(255, CAST(floor((134212225 * qy * 16 + 536870912) / 1073741824.0) AS BIGINT) + 128)) AS ry,
          GREATEST(0, LEAST(255, CAST(floor((134212225 * qcb * 17 + 536870912) / 1073741824.0) AS BIGINT) + 128)) AS rcb,
          GREATEST(0, LEAST(255, CAST(floor((134212225 * qcr * 17 + 536870912) / 1073741824.0) AS BIGINT) + 128)) AS rcr
        FROM qc),
    rgb AS (
        SELECT doc_id, wm, hm, ry,
          GREATEST(0, LEAST(255, ry + CAST(floor((91881 * (rcr - 128) + 32768) / 65536.0) AS BIGINT))) AS r,
          GREATEST(0, LEAST(255, ry - CAST(floor((46802 * (rcr - 128) + 22554 * (rcb - 128) + 32768) / 65536.0) AS BIGINT))) AS g_,
          GREATEST(0, LEAST(255, ry + CAST(floor((116130 * (rcb - 128) + 32768) / 65536.0) AS BIGINT))) AS b
        FROM rc)
    SELECT doc_id, CAST(16 * wm AS INT) AS width, CAST(8 * hm AS INT) AS height,
           CAST(64 * sum(r) AS BIGINT) AS r_sum,
           CAST(64 * sum(g_) AS BIGINT) AS g_sum,
           CAST(64 * sum(b) AS BIGINT) AS b_sum,
           CAST(64 * sum(ry) AS BIGINT) AS y_sum
    FROM rgb GROUP BY doc_id, wm, hm
    """,
    tags=("multimodal", "codec", "image"),
)
def mm_jpeg422_decode_stats(spark, sf_dir):
    """REAL 4:2:2 chroma-subsampled JPEG decode under the bit-level
    oracle — the round-14 widening to the horizontal-only subsampling
    cameras and video frames use (the remaining common layout between
    the gated 4:4:4 and 4:2:0): each 16x8 MCU interleaves two luma
    blocks side by side with one Cb and one Cr block at half HORIZONTAL
    resolution; the decoder reads (2,1) from SOF0, walks the
    interleaved structure (restart resets every 2 MCUs), and the
    pinned nearest-neighbor upsampling runs horizontally only
    (fh=2, fv=1 derived from the plane shapes). The oracle mirrors the
    same fixed-point kernels as the other JPEG gates with the
    2-luma-per-MCU generation rule."""
    from river_spark.operators.jpeg import decode_jpeg_rgb_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_jpeg_rgb_stats(_jpeg422_payloads(docs), "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "width", "height", "r_sum", "g_sum", "b_sum", "y_sum"
    )


# ---- PNG palette rule (round 15, r14 verdict #2 — the highest-hit
# real-world codec residue: indexed-color icons/screenshots/web):
#   depth = [1,2,4,8][d % 4], npal = [2,4,16,199][d % 4]
#   w = 6 + d % 5, h = 6 + d % 4   (h >= 6: all five filters on wire)
#   index(p) = (d*13 + 7*p) % npal  over row-major p in [0, w*h)
#   palette e: r=(d*11+5e)%256, g=(d*17+9e)%256, b=(d*23+3e)%256
#   tRNS present iff d % 3 == 0 over the first (npal+1)//2 entries with
#   a(e) = (d*7 + 29e) % 256, 255 past the chunk -> output RGBA (4ch)


def _png_palette_payloads(docs):
    from river_spark.operators.multimodal import encode_png_palette

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                depth = (1, 2, 4, 8)[d % 4]
                npal = (2, 4, 16, 199)[d % 4]
                w, h = 6 + d % 5, 6 + d % 4
                p = np.arange(w * h, dtype=np.int64)
                idx = ((d * 13 + 7 * p) % npal).astype(np.uint8).reshape(h, w)
                e = np.arange(npal, dtype=np.int64)
                pal = np.stack(
                    [
                        (d * 11 + 5 * e) % 256,
                        (d * 17 + 9 * e) % 256,
                        (d * 23 + 3 * e) % 256,
                    ],
                    axis=1,
                ).astype(np.uint8)
                trns = None
                if d % 3 == 0:
                    ea = np.arange((npal + 1) // 2, dtype=np.int64)
                    trns = ((d * 7 + 29 * ea) % 256).astype(np.uint8)
                ids.append(d)
                payloads.append(
                    encode_png_palette(w, h, idx, pal, trns=trns, depth=depth)
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(gen, schema=schema)


@q(
    "mm_png_palette_decode_stats",
    oracle="""
    WITH spec AS (
        SELECT doc_id,
               CASE doc_id % 4 WHEN 0 THEN 2 WHEN 1 THEN 4
                               WHEN 2 THEN 16 ELSE 199 END AS npal,
               6 + doc_id % 5 AS w, 6 + doc_id % 4 AS h,
               CASE WHEN doc_id % 3 = 0 THEN 4 ELSE 3 END AS nch
        FROM documents),
    px AS (
        SELECT s.doc_id, s.w, s.h, s.nch, s.npal, g.p,
               (s.doc_id * 13 + 7 * g.p) % s.npal AS e
        FROM spec s, UNNEST(generate_series(0, s.w * s.h - 1)) AS g(p)),
    ch AS (
        SELECT doc_id, w, h, nch, p,
               (doc_id * 11 + 5 * e) % 256 AS r,
               (doc_id * 17 + 9 * e) % 256 AS g_,
               (doc_id * 23 + 3 * e) % 256 AS b,
               CASE WHEN nch = 4 THEN
                   CASE WHEN e < (npal + 1) // 2
                        THEN (doc_id * 7 + 29 * e) % 256 ELSE 255 END
               ELSE 0 END AS a
        FROM px)
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(nch AS INT) AS n_channels,
           CAST(sum(r) AS BIGINT) AS r_sum,
           CAST(sum(g_) AS BIGINT) AS g_sum,
           CAST(sum(b) AS BIGINT) AS b_sum,
           CAST(sum(((p * nch + 0) % 997 + 1) * r
                  + ((p * nch + 1) % 997 + 1) * g_
                  + ((p * nch + 2) % 997 + 1) * b
                  + CASE WHEN nch = 4
                         THEN ((p * nch + 3) % 997 + 1) * a ELSE 0 END)
                AS BIGINT) AS pos_weighted_sum
    FROM ch GROUP BY doc_id, w, h, nch
    """,
    tags=("multimodal", "codec", "image"),
)
def mm_png_palette_decode_stats(spark, sf_dir):
    """REAL indexed-color PNG decode under the bit-level oracle (r14
    verdict #2): payloads are genuine color-type-3 PNGs at all four
    palette depths (1/2/4/8 bits — sub-byte MSB-first packing, per-row
    padding), depth and palette size cycling by doc_id, one third of
    the corpus carrying a SHORT tRNS chunk (alpha defaults to 255 past
    its end, output widens to RGBA). Spark encodes with
    encode_png_palette and decodes with operators/multimodal.decode_png
    (PLTE lookup + tRNS expansion after the shared filter/unfilter
    ladder); the oracle recomputes channel sums and the position-
    weighted byte checksum straight from the index/palette rules
    WITHOUT seeing the bytes — a bit-unpack order bug, an off-by-one in
    the palette bound, or a tRNS default mistake all land as BIGINT
    mismatches."""
    from river_spark.operators.multimodal import decode_png_pixel_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_png_pixel_stats(
        _png_palette_payloads(docs), "doc_id", "payload"
    )
    return stats.filter(F.col("ok")).select(
        "doc_id", "width", "height", "n_channels",
        "r_sum", "g_sum", "b_sum", "pos_weighted_sum",
    )


# ---- PNG Adam7 rule (round 15, r14 verdict #2, second half):
#   w = 9 + d % 8, h = 9 + (d // 8) % 8  (9..16: every one of the 7
#   passes non-degenerate at some docs, partial at others)
#   nch = 3 + d % 2 (RGB / RGBA alternating)
#   byte j (row-major, j in [0, w*h*nch)) = (d*41 + 13*j) % 256


def _png_adam7_payloads(docs):
    from river_spark.operators.multimodal import encode_png_adam7

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 9 + d % 8, 9 + (d // 8) % 8
                nch = 3 + d % 2
                j = np.arange(w * h * nch, dtype=np.int64)
                px = ((d * 41 + 13 * j) % 256).astype(np.uint8)
                ids.append(d)
                payloads.append(encode_png_adam7(w, h, px.reshape(h, w, nch)))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(gen, schema=schema)


@q(
    "mm_png_adam7_decode_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 9 + doc_id % 8 AS w, 9 + (doc_id // 8) % 8 AS h,
               3 + doc_id % 2 AS nch
        FROM documents),
    bytes AS (
        SELECT doc_id, w, h, nch, g.j AS j,
               (doc_id * 41 + 13 * g.j) % 256 AS v
        FROM dims, UNNEST(generate_series(0, w * h * nch - 1)) AS g(j))
    SELECT doc_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(nch AS INT) AS n_channels,
           CAST(sum(CASE WHEN j % nch = 0 THEN v ELSE 0 END) AS BIGINT) AS r_sum,
           CAST(sum(CASE WHEN j % nch = 1 THEN v ELSE 0 END) AS BIGINT) AS g_sum,
           CAST(sum(CASE WHEN j % nch = 2 THEN v ELSE 0 END) AS BIGINT) AS b_sum,
           CAST(sum((j % 997 + 1) * v) AS BIGINT) AS pos_weighted_sum
    FROM bytes GROUP BY doc_id, w, h, nch
    """,
    tags=("multimodal", "codec", "image"),
)
def mm_png_adam7_decode_stats(spark, sf_dir):
    """REAL Adam7-interlaced PNG decode under the bit-level oracle (r14
    verdict #2): payloads are genuine interlace-method-1 truecolor PNGs
    (RGB and RGBA alternating by doc_id) whose 9..16-px dimensions make
    every one of the 7 spec passes non-degenerate somewhere in the
    corpus and PARTIAL elsewhere (the empty-pass and odd-remainder
    cases). The encoder scatters pixels into per-pass scanline groups
    (filters cycling within each pass, prev-row reset at pass starts as
    the spec requires); decode_png gathers them back through the shared
    unfilter ladder into row-major order. The oracle recomputes channel
    sums and the position-weighted byte checksum from the row-major
    rule — ANY pass-geometry mistake (swapped offsets, wrong stride,
    missed reset) permutes bytes and lands as a BIGINT mismatch. The
    interlaced and plain paths share only the unfilter helper, so a
    matched encode/decode geometry bug cannot cancel against the plain
    path (cross-path equality is also unit-pinned)."""
    from river_spark.operators.multimodal import decode_png_pixel_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_png_pixel_stats(
        _png_adam7_payloads(docs), "doc_id", "payload"
    )
    return stats.filter(F.col("ok")).select(
        "doc_id", "width", "height", "n_channels",
        "r_sum", "g_sum", "b_sum", "pos_weighted_sum",
    )


# ---- GIF89a animation rule (round 15): multi-frame with sub-rect
# frames, local tables, transparency, interlace, disposal — the real-
# world animated-GIF shape the 87a query can't reach.
#   n = 2 + d % 3 frames; screen W = 22 + d % 3, H = 16 + d % 3
#   frame f: fw = 8 + f % 3, fh = 6 + f % 2
#            left = (d + 5f) % (W - fw + 1), top = (3d + 7f) % (H - fh + 1)
#   odd f: 16-entry LOCAL table, transparent index 1, INTERLACED
#   even f: 256-entry global table, opaque, sequential
#   idx(p) = (d*37 + 17f + 11*(p div 3)) % tbl   (runs of 3 for LZW)
#   global red[i] = (i + d) % 256; local red[i] = (7i + d + f) % 256
#   disposal = 2 until the last frame (0); delay = 4 + f


def _gif_anim_payloads(docs):
    """doc_id -> synthesized GIF89a animation (one mapInPandas pass):
    NETSCAPE loop block, comment extension (exercises the skip walk
    under the driver gate), per-frame GCE + image descriptors."""
    from river_spark.operators.gif import encode_gif_anim

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 2 + d % 3
                W, H = 22 + d % 3, 16 + d % 3
                i = np.arange(256, dtype=np.int64)
                gct = np.stack(
                    [(i + d) % 256, (2 * i + 13 * d) % 256, (3 * i + 7 * d) % 256],
                    axis=1,
                ).astype(np.uint8)
                frames = []
                for f in range(n):
                    fw, fh = 8 + f % 3, 6 + f % 2
                    odd = f % 2 == 1
                    tbl_n = 16 if odd else 256
                    p = np.arange(fw * fh, dtype=np.int64)
                    idx = (
                        ((d * 37 + 17 * f + 11 * (p // 3)) % tbl_n)
                        .astype(np.uint8)
                        .reshape(fh, fw)
                    )
                    lct = None
                    if odd:
                        e = np.arange(16, dtype=np.int64)
                        lct = np.stack(
                            [
                                (7 * e + d + f) % 256,
                                (5 * e + 3 * d + f) % 256,
                                (11 * e + f) % 256,
                            ],
                            axis=1,
                        ).astype(np.uint8)
                    frames.append(
                        dict(
                            left=(d + 5 * f) % (W - fw + 1),
                            top=(3 * d + 7 * f) % (H - fh + 1),
                            indices=idx,
                            local_palette=lct,
                            transparent=1 if odd else None,
                            interlace=odd,
                            disposal=2 if f < n - 1 else 0,
                            delay=4 + f,
                        )
                    )
                ids.append(d)
                payloads.append(
                    encode_gif_anim(
                        W, H, gct, frames, bg_index=d % 256, loop=d % 5,
                        comment=b"river_spark synthetic",
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(gen, schema=schema)


@q(
    "mm_gif_anim_decode_stats",
    oracle="""
    WITH spec AS (
        SELECT doc_id, 2 + doc_id % 3 AS n,
               22 + doc_id % 3 AS sw, 16 + doc_id % 3 AS sh
        FROM documents),
    fr AS (
        SELECT s.doc_id, s.n, s.sw, s.sh, g.f,
               8 + g.f % 3 AS fw, 6 + g.f % 2 AS fh,
               g.f % 2 = 1 AS odd
        FROM spec s, UNNEST(generate_series(0, s.n - 1)) AS g(f)),
    px AS (
        SELECT fr.doc_id, fr.n, fr.f, fr.fw, fr.fh, fr.odd,
               fr.sw, fr.sh, g.p,
               (fr.doc_id * 37 + 17 * fr.f + 11 * (g.p // 3))
                   % (CASE WHEN fr.odd THEN 16 ELSE 256 END) AS idx
        FROM fr, UNNEST(generate_series(0, fr.fw * fr.fh - 1)) AS g(p))
    SELECT doc_id,
           CAST(n AS INT) AS n_frames,
           CAST(f AS INT) AS frame,
           CAST((doc_id + 5 * f) % (sw - fw + 1) AS INT) AS frame_left,
           CAST((3 * doc_id + 7 * f) % (sh - fh + 1) AS INT) AS frame_top,
           CAST(fw AS INT) AS width,
           CAST(fh AS INT) AS height,
           CAST(sum(idx) AS BIGINT) AS idx_sum,
           CAST(sum((p % 997 + 1) * idx) AS BIGINT) AS pos_weighted_sum,
           CAST(sum(CASE WHEN odd THEN (7 * idx + doc_id + f) % 256
                         ELSE (idx + doc_id) % 256 END) AS BIGINT) AS pal_r_sum,
           CAST(sum(CASE WHEN odd AND idx = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS trans_count,
           CAST(max(CASE WHEN odd THEN 1 ELSE 0 END) AS INT) AS local_table,
           CAST(max(CASE WHEN odd THEN 1 ELSE 0 END) AS INT) AS interlaced,
           CAST(CASE WHEN f < n - 1 THEN 2 ELSE 0 END AS INT) AS disposal,
           CAST(4 + f AS INT) AS delay
    FROM px
    GROUP BY doc_id, n, f, fw, fh, sw, sh
    """,
    tags=("multimodal", "codec", "image", "video"),
)
def mm_gif_anim_decode_stats(spark, sf_dir):
    """REAL GIF89a ANIMATION decode under the bit-level oracle (round
    15): payloads are genuine multi-frame 89a files — NETSCAPE2.0 loop
    + comment extensions, per-frame Graphic Control Extensions, SUB-
    RECTANGLE image descriptors, 16-entry LOCAL color tables and
    transparency on odd frames, 4-pass INTERLACE on the same frames,
    disposal cycling restore-to-background -> leave. Spark encodes with
    operators/gif.encode_gif_anim and decodes with decode_gif_anim;
    one output row per frame. The oracle recomputes, straight from the
    rule: the index sum, the position-weighted checksum over the
    DEINTERLACED row-major order (a pass-order or row-scatter defect
    permutes indices and moves the BIGINT), the palette-mapped red sum
    (pins local-vs-global table resolution — the two tables' red rules
    differ), the transparent-pixel count, frame geometry (pins the
    sub-rect parse), and disposal/delay (pins the GCE byte layout).
    Compositing semantics (background init, disposal 2/3 restore,
    transparency holes) are non-SQL-sequential and are pinned by unit
    tests against a hand-built numpy reference
    (tests/test_gif_anim.py). The reference engine has no codecs —
    this is the training-data multimodal family (SURVEY.md)."""
    from river_spark.operators.gif import decode_gif_anim_frame_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_gif_anim_frame_stats(_gif_anim_payloads(docs), "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "n_frames", "frame",
        F.col("left").alias("frame_left"), F.col("top").alias("frame_top"),
        "width", "height", "idx_sum", "pos_weighted_sum", "pal_r_sum",
        "trans_count",
        F.col("local_table").cast("int").alias("local_table"),
        F.col("interlaced").cast("int").alias("interlaced"),
        "disposal", "delay",
    )


# ---- Extended-WAV rule (round 15): the studio/DAW/telephony layouts
# beyond 16-bit PCM + mu-law. Variant v = d % 7:
#   v0 PCM 8-bit | v1 PCM 24 | v2 PCM 32 | v3 float32 | v4 A-law |
#   v5 EXTENSIBLE->PCM 24 | v6 EXTENSIBLE->float32
#   nch = 1 + d % 3, frames = 96 + d % 17, rate = 8000 + 100*(d % 5)
#   r(i) = (d*2654435761 + i*40503) mod M   (i over interleaved samples)
#   v0: s = r%2^8 - 2^7     v1/v5: s = r%2^24 - 2^23
#   v2: s = r%2^32 - 2^31   v3/v6: s = r%2^16 - 2^15 (exact in f4)
#   v4: wire byte b = r%256, s = G.711 A-law expansion of b


def _wav_ext_payloads(docs):
    """doc_id -> synthesized extended-WAV payload (one mapInPandas
    pass), cycling the seven format variants."""
    from river_spark.operators.wav_ext import encode_wav_ext

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                v = d % 7
                nch = 1 + d % 3
                total = nch * (96 + d % 17)
                rate = 8000 + 100 * (d % 5)
                i = np.arange(total, dtype=np.int64)
                r = d * 2654435761 + i * 40503
                if v == 0:
                    fmt, bits, ext, s = 1, 8, False, r % (1 << 8) - (1 << 7)
                elif v in (1, 5):
                    fmt, bits, ext, s = 1, 24, v == 5, r % (1 << 24) - (1 << 23)
                elif v == 2:
                    fmt, bits, ext, s = 1, 32, False, r % (1 << 32) - (1 << 31)
                elif v in (3, 6):
                    fmt, bits, ext = 3, 32, v == 6
                    s = (r % (1 << 16) - (1 << 15)).astype(np.float64)
                else:  # v4: A-law wire bytes
                    fmt, bits, ext, s = 6, 8, False, (r % 256).astype(np.uint8)
                ids.append(d)
                payloads.append(
                    encode_wav_ext(rate, nch, s, fmt=fmt, bits=bits,
                                   extensible=ext, channel_mask=(1 << nch) - 1)
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(gen, schema=schema)


@q(
    "mm_wav_ext_decode_stats",
    oracle="""
    WITH spec AS (
        SELECT doc_id, doc_id % 7 AS v, 1 + doc_id % 3 AS nch,
               (1 + doc_id % 3) * (96 + doc_id % 17) AS total,
               8000 + 100 * (doc_id % 5) AS rate
        FROM documents),
    px AS (
        SELECT s.doc_id, s.v, s.nch, s.total, s.rate, g.i,
               (s.doc_id * 2654435761 + g.i * 40503) AS r
        FROM spec s, UNNEST(generate_series(0, s.total - 1)) AS g(i)),
    samp AS (
        SELECT doc_id, v, nch, total, rate, i,
          CASE
            WHEN v = 0 THEN r % 256 - 128
            WHEN v IN (1, 5) THEN r % 16777216 - 8388608
            WHEN v = 2 THEN r % 4294967296 - 2147483648
            WHEN v IN (3, 6) THEN r % 65536 - 32768
            ELSE CASE WHEN xor(r % 256, 85) >= 128
                 THEN CASE WHEN (xor(r % 256, 85) // 16) % 8 = 0
                      THEN (xor(r % 256, 85) % 16) * 16 + 8
                      ELSE ((xor(r % 256, 85) % 16) * 16 + 264)
                           * CAST(pow(2, (xor(r % 256, 85) // 16) % 8 - 1) AS BIGINT)
                      END
                 ELSE -(CASE WHEN (xor(r % 256, 85) // 16) % 8 = 0
                        THEN (xor(r % 256, 85) % 16) * 16 + 8
                        ELSE ((xor(r % 256, 85) % 16) * 16 + 264)
                             * CAST(pow(2, (xor(r % 256, 85) // 16) % 8 - 1) AS BIGINT)
                        END)
                 END
          END AS s
        FROM px)
    SELECT doc_id,
           CAST(rate AS INT) AS sample_rate,
           CAST(nch AS INT) AS n_channels,
           CAST(CASE WHEN v IN (0, 4) THEN 8
                     WHEN v IN (1, 5) THEN 24 ELSE 32 END AS INT) AS bits,
           CAST(CASE WHEN v IN (3, 6) THEN 3
                     WHEN v = 4 THEN 6 ELSE 1 END AS INT) AS fmt_tag,
           CAST(CASE WHEN v IN (5, 6) THEN 1 ELSE 0 END AS INT) AS extensible,
           CAST(total AS BIGINT) AS n_samples,
           CAST(sum(s) AS BIGINT) AS samp_sum,
           CAST(sum((i % 997 + 1) * s) AS BIGINT) AS pos_weighted_sum
    FROM samp
    GROUP BY doc_id, v, nch, total, rate
    """,
    tags=("multimodal", "codec", "audio"),
)
def mm_wav_ext_decode_stats(spark, sf_dir):
    """REAL extended-format WAV decode under the bit-level oracle
    (round 15): payloads cycle the seven real-world layouts — unsigned
    8-bit PCM (offset-128), packed 24-bit PCM (the studio standard;
    sign extension off the 3-byte little-endian lane), 32-bit PCM,
    IEEE float32 (the DAW standard; fixture values integer-exact in
    f4), G.711 A-law telephony bytes, and WAVE_FORMAT_EXTENSIBLE
    wrappers around 24-bit PCM and float32 (cbSize=22, valid-bits,
    channel mask, SubFormat GUID resolution — how every >16-bit WAV is
    written in the wild). Spark encodes with
    operators/wav_ext.encode_wav_ext and decodes with decode_wav_ext;
    the oracle recomputes the sample sum and interleaved position-
    weighted checksum straight from the per-variant rules (the A-law
    branch RESTATES the G.711 segment formula in SQL) without seeing
    the bytes — a byte-order, sign-extension, or GUID-tag defect moves
    a BIGINT. The 16-bit PCM + mu-law core stays wire-pinned in its
    standing tests (decode_wav_any untouched)."""
    from river_spark.operators.wav_ext import decode_wav_ext_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_wav_ext_stats(_wav_ext_payloads(docs), "doc_id", "payload")
    return stats.filter(F.col("ok")).select(
        "doc_id", "sample_rate", "n_channels", "bits", "fmt_tag",
        F.col("extensible").cast("int").alias("extensible"),
        "n_samples", "samp_sum", "pos_weighted_sum",
    )


# ---- Indexed-BMP rule (round 15): the classic palette layouts +
# RLE. Variant v = d % 5:
#   v0 1-bit/2 colors | v1 4-bit/16 | v2 8-bit/199 colors TOP-DOWN |
#   v3 8-bit RLE8/256 | v4 4-bit RLE4/16
#   w = 11 + d % 6, h = 7 + d % 5
#   even rows (runs of 4, feeds RLE encoded mode):
#       idx(p) = (d*13 + 7*(p div 4)) % npal
#   odd rows (literal-ish, feeds RLE absolute mode):
#       idx(p) = (d*29 + 11*p) % npal
#   palette e: r=(d*11+5e)%256, g=(d*17+9e)%256, b=(d*23+3e)%256


def _bmp_indexed_payloads(docs):
    from river_spark.operators.bmp_indexed import encode_bmp_indexed

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                v = d % 5
                bpp = (1, 4, 8, 8, 4)[v]
                comp = (0, 0, 0, 1, 2)[v]
                npal = (2, 16, 199, 256, 16)[v]
                w, h = 11 + d % 6, 7 + d % 5
                p = np.arange(w * h, dtype=np.int64)
                even = (p // w) % 2 == 0
                idx = np.where(
                    even,
                    (d * 13 + 7 * (p // 4)) % npal,
                    (d * 29 + 11 * p) % npal,
                ).astype(np.uint8).reshape(h, w)
                e = np.arange(npal, dtype=np.int64)
                pal = np.stack(
                    [
                        (d * 11 + 5 * e) % 256,
                        (d * 17 + 9 * e) % 256,
                        (d * 23 + 3 * e) % 256,
                    ],
                    axis=1,
                ).astype(np.uint8)
                ids.append(d)
                payloads.append(
                    encode_bmp_indexed(
                        w, h, idx, pal, bpp=bpp, compression=comp,
                        top_down=(v == 2),
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(gen, schema=schema)


@q(
    "mm_bmp_indexed_decode_stats",
    oracle="""
    WITH spec AS (
        SELECT doc_id, doc_id % 5 AS v,
               11 + doc_id % 6 AS w, 7 + doc_id % 5 AS h,
               CASE doc_id % 5 WHEN 0 THEN 2 WHEN 1 THEN 16
                    WHEN 2 THEN 199 WHEN 3 THEN 256 ELSE 16 END AS npal
        FROM documents),
    px AS (
        SELECT s.doc_id, s.v, s.w, s.h, s.npal, g.p,
               CASE WHEN (g.p // s.w) % 2 = 0
                    THEN (s.doc_id * 13 + 7 * (g.p // 4)) % s.npal
                    ELSE (s.doc_id * 29 + 11 * g.p) % s.npal
               END AS e
        FROM spec s, UNNEST(generate_series(0, s.w * s.h - 1)) AS g(p))
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(CASE v WHEN 0 THEN 1 WHEN 1 THEN 4
                WHEN 4 THEN 4 ELSE 8 END AS INT) AS bpp,
           CAST(CASE v WHEN 3 THEN 1 WHEN 4 THEN 2 ELSE 0 END
                AS INT) AS compression,
           CAST(npal AS INT) AS n_colors,
           CAST(sum(e) AS BIGINT) AS idx_sum,
           CAST(sum((p % 997 + 1) * e) AS BIGINT) AS pos_weighted_sum,
           CAST(sum((doc_id * 11 + 5 * e) % 256) AS BIGINT) AS pal_r_sum
    FROM px GROUP BY doc_id, v, w, h, npal
    """,
    tags=("multimodal", "codec", "image"),
)
def mm_bmp_indexed_decode_stats(spark, sf_dir):
    """REAL indexed-color BMP decode under the bit-level oracle (round
    15): payloads cycle the five classic palette layouts — 1-bit
    (MSB-first bit unpack), 4-bit (nibble unpack), 8-bit with a
    199-entry table (pins biClrUsed against the 2^bpp default) written
    TOP-DOWN (negative-height path), 8-bit RLE8 and 4-bit RLE4 (encoded
    runs from the even rows' runs-of-4 rule, ABSOLUTE-mode stretches
    from the odd rows' literal rule, end-of-line/end-of-bitmap escapes,
    word alignment). Spark encodes with
    operators/bmp_indexed.encode_bmp_indexed and decodes with
    decode_bmp_indexed; the oracle recomputes the index sum, the
    position-weighted checksum over the TOP-DOWN row-major order (a
    bottom-up flip, nibble-order, or RLE-cursor defect permutes pixels
    and moves the BIGINT), and the palette-mapped red sum (pins the
    BGRA quad parse) straight from the rules. The RLE delta escape is
    decoder-only (no encoder emits it) and unit-pinned with a
    handcrafted stream (tests/test_bmp_indexed.py); the 24-bit
    truecolor path stays untouched."""
    from river_spark.operators.bmp_indexed import decode_bmp_indexed_stats

    docs = tbl(spark, sf_dir, "documents")
    stats = decode_bmp_indexed_stats(
        _bmp_indexed_payloads(docs), "doc_id", "payload"
    )
    return stats.filter(F.col("ok")).select(
        "doc_id", "width", "height", "bpp", "compression", "n_colors",
        "idx_sum", "pos_weighted_sum", "pal_r_sum",
    )
