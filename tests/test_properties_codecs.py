"""Property-based fuzz of the round-14 codec widenings: randomized
signals and knob combinations through the pure-numpy FLAC and TIFF
codecs, asserting exact losslessness. No Spark involved, so example
counts can be generous — these are the bit-level paths where an
off-by-one lives (partition boundaries, wasted-bit shifts, tile-edge
padding)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from river_spark.operators.flac import decode_flac, encode_flac
from river_spark.operators.tiff import decode_tiff, encode_tiff

_SETTINGS = dict(max_examples=25, deadline=None, derandomize=True)


@given(
    n=st.integers(2, 700),
    seed=st.integers(0, 2**31 - 1),
    amp=st.sampled_from([3, 200, 4000, 32767]),
    shift=st.integers(0, 3),
    block=st.sampled_from([64, 128, 192, 256]),
    orders=st.sampled_from([(0,), (1,), (3,), (0, 1, 2, 3, 4)]),
    wasted=st.booleans(),
    lpc=st.sampled_from([(), (2, 4, 8)]),
)
@settings(**_SETTINGS)
def test_flac_mono_lossless_under_all_knobs(n, seed, amp, shift, block,
                                            orders, wasted, lpc):
    rng = np.random.default_rng(seed)
    x = rng.integers(-amp - 1, amp + 1, n).astype(np.int64)
    x = np.clip(x << shift, -32768, 32767).astype(np.int16)
    data = encode_flac(8000, x, block_size=block, partition_orders=orders,
                       detect_wasted=wasted, lpc_orders=lpc)
    rate, out = decode_flac(data)
    assert rate == 8000
    assert np.array_equal(out, x)


@given(
    n=st.integers(2, 500),
    seed=st.integers(0, 2**31 - 1),
    mode=st.sampled_from(["auto", "cycle"]),
    orders=st.sampled_from([(0,), (0, 1, 2)]),
    wasted=st.booleans(),
)
@settings(**_SETTINGS)
def test_flac_stereo_lossless_under_all_knobs(n, seed, mode, orders, wasted):
    rng = np.random.default_rng(seed)
    # correlated pair (keeps side channels plausible) incl. extremes
    left = rng.integers(-32768, 32768, n)
    right = np.clip(left + rng.integers(-300, 301, n), -32768, 32767)
    s = np.stack([left, right], axis=1).astype(np.int16)
    data = encode_flac(16000, s, block_size=128, channel_mode=mode,
                       partition_orders=orders, detect_wasted=wasted,
                       lpc_orders=(2, 4))
    _, out = decode_flac(data)
    assert np.array_equal(out, s)


@given(
    w=st.integers(1, 70),
    h=st.integers(1, 70),
    seed=st.integers(0, 2**31 - 1),
    rgb=st.booleans(),
    comp=st.sampled_from([1, 5, 32773]),
    pred=st.sampled_from([1, 2]),
    tile=st.sampled_from([None, (16, 16), (32, 16), (16, 48)]),
)
@settings(**_SETTINGS)
def test_tiff_lossless_under_all_knobs(w, h, seed, rgb, comp, pred, tile):
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    img = rng.integers(0, 256, shape).astype(np.uint8)
    data = encode_tiff(img, compression=comp, predictor=pred, tile_size=tile)
    dw, dh, out = decode_tiff(data)
    assert (dw, dh) == (w, h)
    assert np.array_equal(out, img)


# ---------------------------------------------------------------------------
# Round 14: extend the fuzz to the whole LOSSLESS codec family — any
# off-by-one in padding, filtering, LZW sub-blocking, or chunk walking
# lands as a roundtrip mismatch here before a driver row can see it.
# ---------------------------------------------------------------------------

@given(w=st.integers(1, 40), h=st.integers(1, 40), seed=st.integers(0, 2**31 - 1))
@settings(**_SETTINGS)
def test_bmp_lossless(w, h, seed):
    from river_spark.operators.multimodal import decode_bmp, encode_bmp
    rgb = np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)
    dw, dh, out = decode_bmp(encode_bmp(w, h, rgb))
    assert (dw, dh) == (w, h) and np.array_equal(out, rgb)


@given(w=st.integers(1, 40), h=st.integers(1, 40), seed=st.integers(0, 2**31 - 1),
       alpha=st.booleans(), smooth=st.booleans())
@settings(**_SETTINGS)
def test_png_lossless(w, h, seed, alpha, smooth):
    from river_spark.operators.multimodal import decode_png, encode_png
    rng = np.random.default_rng(seed)
    nch = 4 if alpha else 3
    if smooth:  # gradients exercise Sub/Up/Average/Paeth meaningfully
        base = (np.arange(w)[None, :] * 3 + np.arange(h)[:, None] * 5) % 256
        img = np.stack([(base + 17 * c) % 256 for c in range(nch)],
                       axis=2).astype(np.uint8)
    else:
        img = rng.integers(0, 256, (h, w, nch)).astype(np.uint8)
    dw, dh, out = decode_png(encode_png(w, h, img))
    assert (dw, dh) == (w, h) and np.array_equal(out, img)


@given(w=st.integers(1, 40), h=st.integers(1, 40), seed=st.integers(0, 2**31 - 1),
       depth=st.sampled_from([1, 2, 4, 8]), trns=st.booleans(),
       interlace=st.sampled_from([0, 1]))
@settings(**_SETTINGS)
def test_png_palette_lossless(w, h, seed, depth, trns, interlace):
    """Indexed-color round trip across all four palette depths (sub-byte
    MSB-first packing), short-tRNS alpha expansion, and both interlace
    methods — the full round-15 decode matrix."""
    from river_spark.operators.multimodal import decode_png, encode_png_palette
    rng = np.random.default_rng(seed)
    npal = min(1 << depth, 1 + int(rng.integers(1, 256)))
    pal = rng.integers(0, 256, (npal, 3)).astype(np.uint8)
    idx = rng.integers(0, npal, (h, w)).astype(np.uint8)
    tr = (rng.integers(0, 256, max(1, npal // 2)).astype(np.uint8)
          if trns else None)
    dw, dh, out = decode_png(
        encode_png_palette(w, h, idx, pal, trns=tr, depth=depth,
                           interlace=interlace))
    assert (dw, dh) == (w, h)
    assert np.array_equal(out[:, :, :3], pal[idx])
    if tr is None:
        assert out.shape[2] == 3
    else:
        alpha = np.full(npal, 255, dtype=np.uint8)
        alpha[: len(tr)] = tr
        assert out.shape[2] == 4 and np.array_equal(out[:, :, 3], alpha[idx])


@given(w=st.integers(1, 40), h=st.integers(1, 40), seed=st.integers(0, 2**31 - 1),
       alpha=st.booleans())
@settings(**_SETTINGS)
def test_png_adam7_lossless(w, h, seed, alpha):
    """Adam7 round trip at arbitrary dimensions (degenerate passes
    included), plus cross-path equality: the interlaced and plain
    pipelines share only the unfilter helper, so a matched
    encode/decode pass-geometry bug cannot cancel — it would diverge
    from the non-interlaced decode of the same pixels."""
    from river_spark.operators.multimodal import (
        decode_png, encode_png, encode_png_adam7)
    rng = np.random.default_rng(seed)
    nch = 4 if alpha else 3
    img = rng.integers(0, 256, (h, w, nch)).astype(np.uint8)
    dw, dh, out = decode_png(encode_png_adam7(w, h, img))
    assert (dw, dh) == (w, h) and np.array_equal(out, img)
    assert np.array_equal(out, decode_png(encode_png(w, h, img))[2])


@given(w=st.integers(1, 40), h=st.integers(1, 40), seed=st.integers(0, 2**31 - 1),
       alpha=st.booleans(), interlace=st.sampled_from([0, 1]),
       depth=st.sampled_from([1, 2, 4, 8]))
@settings(**_SETTINGS)
def test_png_gray_lossless(w, h, seed, alpha, interlace, depth):
    """Grayscale (color 0 -> RGB, depths 1/2/4/8 with the spec's exact
    255/(2^d-1) sample scaling) and gray+alpha (color 4 -> RGBA)
    round trips, plain and Adam7."""
    from river_spark.operators.multimodal import decode_png, encode_png_gray
    rng = np.random.default_rng(seed)
    if alpha:
        depth = 8  # spec: color 4 is 8/16-bit only
    g = rng.integers(0, 1 << depth, (h, w)).astype(np.uint8)
    a = rng.integers(0, 256, (h, w)).astype(np.uint8) if alpha else None
    dw, dh, out = decode_png(encode_png_gray(w, h, g, alpha=a,
                                             interlace=interlace,
                                             depth=depth))
    assert (dw, dh) == (w, h)
    assert out.shape[2] == (4 if alpha else 3)
    exp = (g * (255 // ((1 << depth) - 1))).astype(np.uint8)
    for c in range(3):
        assert np.array_equal(out[:, :, c], exp)
    if alpha:
        assert np.array_equal(out[:, :, 3], a)


@given(w=st.integers(1, 30), h=st.integers(1, 30), seed=st.integers(0, 2**31 - 1),
       nch=st.sampled_from([1, 2, 3, 4]), interlace=st.sampled_from([0, 1]))
@settings(**_SETTINGS)
def test_png_16bit_lossless(w, h, seed, nch, interlace):
    """16-bit round trips across all four color layouts (gray /
    gray+alpha / RGB / RGBA) and both interlace methods: big-endian
    sample packing with byte-level filtering (bpp = 2*C). Full-range
    values so a hi/lo byte swap or a filter-unit mistake cannot hide."""
    from river_spark.operators.multimodal import decode_png, encode_png_16
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 65536, (h, w, nch)).astype(np.uint16)
    dw, dh, out = decode_png(encode_png_16(w, h, px, interlace=interlace))
    assert (dw, dh) == (w, h) and out.dtype == np.uint16
    if nch >= 3:
        assert np.array_equal(out, px)
    else:
        for c in range(3):
            assert np.array_equal(out[:, :, c], px[:, :, 0])
        if nch == 2:
            assert np.array_equal(out[:, :, 3], px[:, :, 1])
        else:
            assert out.shape[2] == 3


@given(w=st.integers(1, 40), h=st.integers(1, 40), seed=st.integers(0, 2**31 - 1),
       alpha=st.booleans(), runs=st.booleans())
@settings(**_SETTINGS)
def test_qoi_lossless(w, h, seed, alpha, runs):
    from river_spark.operators.multimodal import decode_qoi, encode_qoi
    rng = np.random.default_rng(seed)
    nch = 4 if alpha else 3
    if runs:  # long runs + small deltas exercise RUN/INDEX/DIFF/LUMA
        flat = np.repeat(rng.integers(0, 256, (-(-w * h // 7), nch)),
                         7, axis=0)[: w * h]
        img = flat.reshape(h, w, nch).astype(np.uint8)
    else:
        img = rng.integers(0, 256, (h, w, nch)).astype(np.uint8)
    dw, dh, out = decode_qoi(encode_qoi(w, h, img))
    assert (dw, dh) == (w, h) and np.array_equal(out, img)


@given(w=st.integers(1, 40), h=st.integers(1, 40), seed=st.integers(0, 2**31 - 1))
@settings(**_SETTINGS)
def test_gif_lossless(w, h, seed):
    from river_spark.operators.multimodal import decode_gif, encode_gif
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 256, (h, w)).astype(np.uint8)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    dw, dh, didx, dpal = decode_gif(encode_gif(w, h, idx, pal))
    assert (dw, dh) == (w, h)
    assert np.array_equal(didx, idx) and np.array_equal(dpal, pal)


@given(n=st.integers(1, 2000), nch=st.integers(1, 2),
       seed=st.integers(0, 2**31 - 1))
@settings(**_SETTINGS)
def test_wav_pcm16_lossless(n, nch, seed):
    from river_spark.operators.multimodal import decode_wav, encode_wav
    s = np.random.default_rng(seed).integers(-32768, 32768, n * nch)
    s = s.astype(np.int16)
    rate, ch, out = decode_wav(encode_wav(8000, nch, s))
    assert rate == 8000 and ch == nch
    assert np.array_equal(np.asarray(out).reshape(-1), s)


@given(nf=st.integers(1, 6), w=st.integers(1, 24), h=st.integers(1, 24),
       seed=st.integers(0, 2**31 - 1))
@settings(**_SETTINGS)
def test_avi_lossless(nf, w, h, seed):
    from river_spark.operators.avi import decode_avi, encode_avi
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
              for _ in range(nf)]
    dw, dh, fps, out = decode_avi(encode_avi(frames, fps=12))
    assert (dw, dh, fps) == (w, h, 12) and len(out) == nf
    for a, b in zip(out, frames):
        assert np.array_equal(a, b)


# ---------------------------------------------------------------------------
# Round 14: corruption fuzz — a malformed payload must land in the
# exception set the Arrow stats operators catch (ValueError / IndexError
# / struct.error / StopIteration), never an executor-crashing KeyError,
# MemoryError, internal control-flow exception, or hang. 600 mutations
# per codec: byte flips, truncations, random splices.
# ---------------------------------------------------------------------------

import struct as _struct

_CATCHABLE = (ValueError, IndexError, _struct.error, StopIteration)


def _mutations(data: bytes, rng, n=200):
    for trial in range(n):
        d = bytearray(data)
        mode = trial % 3
        if mode == 0:
            p = int(rng.integers(0, len(d)))
            d[p] ^= int(rng.integers(1, 256))
        elif mode == 1:
            d = d[: int(rng.integers(1, len(d)))]
        else:
            p = int(rng.integers(0, len(d)))
            q = int(rng.integers(0, 64))
            d[p : p + q] = bytes(rng.integers(0, 256, q).tolist())
        yield bytes(d)


@pytest.mark.parametrize("codec", ["flac", "tiff", "jpeg", "png", "qoi",
                                   "gif", "gif_anim", "bmp", "avi",
                                   "png_palette", "png_adam7", "png_gray",
                                   "png_gray_subbyte", "png_16bit",
                                   "wav_ext", "bmp_rle8", "bmp_rle4",
                                   "bmp_1bit", "ms_adpcm", "jpeg_prog420",
                                   "tiff_deflate16", "tiff_palette",
                                   "image_any", "audio_any", "apng"])
def test_corruption_never_escapes_the_catch_set(codec):
    from river_spark.operators.apng import decode_apng, encode_apng
    from river_spark.operators.avi import decode_avi, encode_avi
    from river_spark.operators.bmp_indexed import (
        decode_bmp_indexed, encode_bmp_indexed)
    from river_spark.operators.flac import decode_flac, encode_flac
    from river_spark.operators.gif import decode_gif_anim, encode_gif_anim
    from river_spark.operators.ms_adpcm import (
        decode_ms_adpcm_wav, encode_ms_adpcm_wav)
    from river_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive_script)
    from river_spark.operators.multimodal import (
        decode_bmp, decode_gif, decode_image_any, decode_png, decode_qoi,
        encode_bmp, encode_gif, encode_png, encode_png_16,
        encode_png_adam7, encode_png_gray, encode_png_palette, encode_qoi)
    from river_spark.operators.tiff import decode_tiff, encode_tiff
    from river_spark.operators.wav_ext import (
        decode_audio_any, decode_wav_ext, encode_wav_ext)

    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (17, 23, 3)).astype(np.uint8)
    idx = rng.integers(0, 256, (10, 12)).astype(np.uint8)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    plane = np.kron(rng.integers(0, 256, (2, 3)).astype(np.uint8),
                    np.ones((8, 8), dtype=np.uint8))
    i = np.arange(400, dtype=np.int64)
    payloads = {
        "flac": (encode_flac(8000, ((7 * i) % 4001 - 2000),
                             partition_orders=(0, 1, 2), detect_wasted=True,
                             variable_blocking=True), decode_flac),
        "tiff": (encode_tiff(img, compression=5, predictor=2,
                             tile_size=(16, 16)), decode_tiff),
        "jpeg": (encode_jpeg([plane] * 3), decode_jpeg),
        "png": (encode_png(23, 17, img), decode_png),
        "png_palette": (
            encode_png_palette(12, 10, (idx % 16), pal[:16],
                               trns=pal[:7, 0], depth=4),
            decode_png,
        ),
        "png_adam7": (encode_png_adam7(23, 17, img), decode_png),
        "png_gray": (encode_png_gray(12, 10, idx, alpha=(idx[::-1]),
                                     interlace=1), decode_png),
        "png_gray_subbyte": (encode_png_gray(12, 10, (idx % 4), depth=2,
                                             interlace=1), decode_png),
        "png_16bit": (encode_png_16(
            12, 10, (idx.astype(np.uint16)[:, :, None] * 257
                     ).repeat(3, axis=2)), decode_png),
        "qoi": (encode_qoi(23, 17, img), decode_qoi),
        "gif": (encode_gif(12, 10, idx, pal), decode_gif),
        "gif_anim": (
            encode_gif_anim(
                16, 12, pal,
                [dict(left=2, top=1, indices=(idx % 16), transparent=3,
                      local_palette=pal[:16], interlace=True, disposal=2,
                      delay=4),
                 dict(indices=idx)],
                bg_index=7, loop=2, comment=b"fuzz",
            ),
            decode_gif_anim,
        ),
        "bmp": (encode_bmp(23, 17, img), decode_bmp),
        "avi": (encode_avi([img, img]), decode_avi),
        "wav_ext": (
            encode_wav_ext(44100, 2, i * 40503 - 8000000, fmt=1, bits=24,
                           extensible=True, channel_mask=0x3),
            decode_wav_ext,
        ),
        "bmp_rle8": (
            encode_bmp_indexed(12, 10, idx, pal, bpp=8, compression=1),
            decode_bmp_indexed,
        ),
        "bmp_rle4": (
            encode_bmp_indexed(12, 10, (idx % 16), pal[:16], bpp=4,
                               compression=2),
            decode_bmp_indexed,
        ),
        "bmp_1bit": (
            encode_bmp_indexed(12, 10, (idx % 2), pal[:2], bpp=1),
            decode_bmp_indexed,
        ),
        "ms_adpcm": (
            encode_ms_adpcm_wav(8000, 2, ((11 * i) % 9001 - 4500)
                                .repeat(2)[: 2 * 384], samples_per_block=128),
            decode_ms_adpcm_wav,
        ),
        "jpeg_prog420": (
            encode_jpeg_progressive_script(
                [np.kron(rng.integers(0, 256, (2, 4)).astype(np.uint8),
                         np.ones((8, 8), np.uint8)),
                 np.kron(rng.integers(0, 256, (1, 2)).astype(np.uint8),
                         np.ones((8, 8), np.uint8)),
                 np.kron(rng.integers(0, 256, (1, 2)).astype(np.uint8),
                         np.ones((8, 8), np.uint8))],
                None, samps=[(2, 2), (1, 1), (1, 1)]),
            decode_jpeg,
        ),
        "tiff_deflate16": (
            encode_tiff(rng.integers(0, 65536, (9, 11, 3)).astype(np.uint16),
                        compression=8, predictor=2, tile_size=(16, 16)),
            decode_tiff,
        ),
        "tiff_palette": (
            encode_tiff(idx, compression=8,
                        colormap=rng.integers(0, 65536, (256, 3))
                        .astype(np.uint16)),
            decode_tiff,
        ),
        "image_any": (encode_png(23, 17, img), decode_image_any),
        "apng": (
            encode_apng(12, 10,
                [dict(rgba=np.dstack([idx[:10, :12]] * 4)),
                 dict(rgba=np.dstack([idx[:4, :5]] * 4), x=2, y=3,
                      blend=1, dispose=2)]),
            decode_apng,
        ),
        "audio_any": (
            encode_wav_ext(8000, 1, (i % 256).astype(np.uint8), fmt=6,
                           bits=8),
            decode_audio_any,
        ),
    }
    payload, dec = payloads[codec]
    import time
    t0 = time.perf_counter()
    for d in _mutations(payload, rng, n=600):
        try:
            dec(d)  # silent decode is fine for CRC-less formats
        except _CATCHABLE:
            pass
    # nothing above may hang either: the whole sweep stays sub-30s
    assert time.perf_counter() - t0 < 30.0


# ---------------------------------------------------------------------------
# Round-15: tRNS color key for gray (color 0) and truecolor (color 2) —
# the transparent-background convention of the pre-alpha PNG era.
# ---------------------------------------------------------------------------

import struct as _st


def _with_trns(payload: bytes, body: bytes) -> bytes:
    """Insert a tRNS chunk right after IHDR (spec-legal position)."""
    from river_spark.operators.multimodal import _png_chunk

    at = 8 + 8 + 13 + 4  # signature + IHDR chunk
    return payload[:at] + _png_chunk(b"tRNS", body) + payload[at:]


@given(seed=st.integers(0, 2**31 - 1), depth=st.sampled_from([1, 2, 4, 8, 16]),
       interlace=st.sampled_from([0, 1]))
@settings(**_SETTINGS)
def test_png_trns_gray_key(seed, depth, interlace):
    """Color-0 tRNS: the 2-byte key matches RAW samples (pre-scaling
    for sub-byte depths); matching pixels get alpha 0, output widens
    to RGBA at the image's dtype."""
    from river_spark.operators.multimodal import (
        decode_png, encode_png_16, encode_png_gray)

    rng = np.random.default_rng(seed)
    w, h = int(rng.integers(1, 20)), int(rng.integers(1, 20))
    hi = 1 << depth
    key = int(rng.integers(0, hi))
    if depth == 16:
        g = rng.integers(0, hi, (h, w, 1)).astype(np.uint16)
        g[0, 0, 0] = key
        payload = _with_trns(encode_png_16(w, h, g, interlace=interlace),
                             _st.pack(">H", key))
        dw, dh, out = decode_png(payload)
        assert out.dtype == np.uint16 and out.shape == (h, w, 4)
        assert np.array_equal(out[:, :, 3] == 0, g[:, :, 0] == key)
        assert np.array_equal(out[:, :, 0], g[:, :, 0])
    else:
        g = rng.integers(0, hi, (h, w)).astype(np.uint8)
        g[0, 0] = key
        payload = _with_trns(
            encode_png_gray(w, h, g, depth=depth, interlace=interlace),
            _st.pack(">H", key))
        dw, dh, out = decode_png(payload)
        assert out.shape == (h, w, 4)
        assert np.array_equal(out[:, :, 3] == 0, g == key)
        scale = 255 // (hi - 1)
        assert np.array_equal(out[:, :, 0], (g * scale).astype(np.uint8))


@given(seed=st.integers(0, 2**31 - 1), depth=st.sampled_from([8, 16]),
       interlace=st.sampled_from([0, 1]))
@settings(**_SETTINGS)
def test_png_trns_rgb_key(seed, depth, interlace):
    from river_spark.operators.multimodal import (
        decode_png, encode_png, encode_png_16, encode_png_adam7)

    rng = np.random.default_rng(seed)
    w, h = int(rng.integers(1, 16)), int(rng.integers(1, 16))
    hi = 1 << depth
    key = tuple(int(x) for x in rng.integers(0, hi, 3))
    if depth == 16:
        px = rng.integers(0, hi, (h, w, 3)).astype(np.uint16)
        px[0, 0] = key
        payload = encode_png_16(w, h, px, interlace=interlace)
    else:
        px = rng.integers(0, hi, (h, w, 3)).astype(np.uint8)
        px[0, 0] = key
        payload = (encode_png_adam7(w, h, px) if interlace
                   else encode_png(w, h, px))
    payload = _with_trns(payload, _st.pack(">HHH", *key))
    dw, dh, out = decode_png(payload)
    assert out.shape == (h, w, 4)
    match = ((px[:, :, 0] == key[0]) & (px[:, :, 1] == key[1])
             & (px[:, :, 2] == key[2]))
    assert np.array_equal(out[:, :, 3] == 0, match)
    assert np.array_equal(out[:, :, :3], px)


def test_png_trns_rejects():
    from river_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(61)
    rgba = rng.integers(0, 256, (4, 4, 4)).astype(np.uint8)
    with pytest.raises(ValueError, match="forbidden for alpha"):
        decode_png(_with_trns(encode_png(4, 4, rgba),
                              _st.pack(">HHH", 1, 2, 3)))
    rgb = rng.integers(0, 256, (4, 4, 3)).astype(np.uint8)
    with pytest.raises(ValueError, match="must be 6 bytes"):
        decode_png(_with_trns(encode_png(4, 4, rgb), _st.pack(">H", 1)))
    with pytest.raises(ValueError, match="outside the sample range"):
        decode_png(_with_trns(encode_png(4, 4, rgb),
                              _st.pack(">HHH", 300, 0, 0)))
