"""APNG (operators/apng.py): lossless frame round trips under
randomized knobs, compositing against an independent numpy reference,
the blend-OVER integer convention against the spec's real-valued
equation, static-PNG interop, and reject paths. Pure codec tests — no
Spark."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from river_spark.operators.apng import (
    _blend_over,
    composite_apng,
    decode_apng,
    encode_apng,
)

_SETTINGS = dict(max_examples=25, deadline=None, derandomize=True)


def _rand_anim(rng, n_frames, w, h):
    frames = [dict(rgba=rng.integers(0, 256, (h, w, 4)).astype(np.uint8),
                   delay=(int(rng.integers(0, 100)), int(rng.integers(1, 100))),
                   dispose=int(rng.integers(0, 3)))]
    for _ in range(n_frames - 1):
        fw, fh = int(rng.integers(1, w + 1)), int(rng.integers(1, h + 1))
        frames.append(dict(
            rgba=rng.integers(0, 256, (fh, fw, 4)).astype(np.uint8),
            x=int(rng.integers(0, w - fw + 1)),
            y=int(rng.integers(0, h - fh + 1)),
            delay=(int(rng.integers(0, 100)), int(rng.integers(1, 100))),
            dispose=int(rng.integers(0, 3)),
            blend=int(rng.integers(0, 2)),
        ))
    return frames


@given(seed=st.integers(0, 2**31 - 1), n_frames=st.integers(1, 6),
       w=st.integers(1, 24), h=st.integers(1, 24))
@settings(**_SETTINGS)
def test_roundtrip_lossless(seed, n_frames, w, h):
    rng = np.random.default_rng(seed)
    frames = _rand_anim(rng, n_frames, w, h)
    plays = int(rng.integers(0, 10))
    anim = decode_apng(encode_apng(w, h, frames, num_plays=plays))
    assert (anim["width"], anim["height"]) == (w, h)
    assert anim["num_plays"] == plays and len(anim["frames"]) == n_frames
    for fin, fout in zip(frames, anim["frames"]):
        assert np.array_equal(fout["rgba"], fin["rgba"])
        assert (fout["x"], fout["y"]) == (fin.get("x", 0), fin.get("y", 0))
        assert (fout["delay_num"], fout["delay_den"]) == fin["delay"]
        assert fout["dispose"] == fin.get("dispose", 0)
        assert fout["blend"] == fin.get("blend", 0)


@given(seed=st.integers(0, 2**31 - 1), n_frames=st.integers(1, 5))
@settings(**_SETTINGS)
def test_compositing_matches_reference(seed, n_frames):
    """SOURCE/OVER + all three dispose ops replayed independently; the
    first frame's dispose-previous downgrades to background (spec)."""
    rng = np.random.default_rng(seed)
    w, h = int(rng.integers(4, 20)), int(rng.integers(4, 20))
    frames = _rand_anim(rng, n_frames, w, h)
    anim = decode_apng(encode_apng(w, h, frames))
    rendered = composite_apng(anim, all_frames=True)
    final = composite_apng(anim)

    canvas = np.zeros((h, w, 4), np.uint8)
    for fi, fr in enumerate(frames):
        dispose = fr.get("dispose", 0)
        if fi == 0 and dispose == 2:
            dispose = 1
        before = canvas.copy()
        x, y = fr.get("x", 0), fr.get("y", 0)
        fh, fw = fr["rgba"].shape[:2]
        if fr.get("blend", 0) == 0:
            canvas[y : y + fh, x : x + fw] = fr["rgba"]
        else:
            canvas[y : y + fh, x : x + fw] = _blend_over(
                canvas[y : y + fh, x : x + fw], fr["rgba"])
        assert np.array_equal(rendered[fi], canvas), f"frame {fi}"
        if dispose == 1:
            canvas[y : y + fh, x : x + fw] = 0
        elif dispose == 2:
            canvas = before
    assert np.array_equal(final, canvas)


def test_blend_over_integer_convention():
    """Endpoint-exact (alpha 255 -> source, alpha 0 -> dest) and within
    1/255 of the spec's real-valued source-over equation everywhere."""
    rng = np.random.default_rng(5)
    dst = rng.integers(0, 256, (16, 16, 4)).astype(np.uint8)
    src = rng.integers(0, 256, (16, 16, 4)).astype(np.uint8)
    s_op = src.copy(); s_op[:, :, 3] = 255
    assert np.array_equal(_blend_over(dst, s_op), s_op)
    s_tr = src.copy(); s_tr[:, :, 3] = 0
    dst_vis = dst.copy()
    dst_vis[:, :, 3] = np.maximum(dst_vis[:, :, 3], 1)  # dst visible
    assert np.array_equal(_blend_over(dst_vis, s_tr), dst_vis)
    # transparent over transparent: fully transparent out (RGB is
    # undefined by the spec at alpha 0; this decoder emits 0)
    d_tr = dst.copy(); d_tr[:, :, 3] = 0
    out = _blend_over(d_tr, s_tr)
    assert np.all(out[:, :, 3] == 0) and np.all(out[:, :, :3] == 0)
    a_s = src[:, :, 3:4] / 255.0
    a_d = dst[:, :, 3:4] / 255.0
    out_a = a_s + a_d * (1 - a_s)
    ref = np.where(out_a > 0,
                   (src[:, :, :3] * a_s + dst[:, :, :3] * a_d * (1 - a_s))
                   / np.maximum(out_a, 1e-12), 0)
    got = _blend_over(dst, src)
    assert np.abs(got[:, :, :3].astype(np.float64) - ref).max() <= 1.0
    assert np.abs(got[:, :, 3].astype(np.float64)
                  - out_a[:, :, 0] * 255).max() <= 1.0


def test_static_png_interop():
    """An APNG's wire remains a VALID static PNG whose IDAT is frame 0
    (the format's backward-compatibility guarantee); conversely the
    anim decoder rejects static PNGs (no acTL)."""
    from river_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    f0 = rng.integers(0, 256, (9, 13, 4)).astype(np.uint8)
    f1 = rng.integers(0, 256, (4, 5, 4)).astype(np.uint8)
    payload = encode_apng(13, 9, [dict(rgba=f0), dict(rgba=f1, x=2, y=1)])
    w, h, px = decode_png(payload)
    assert (w, h) == (13, 9) and np.array_equal(px, f0)
    with pytest.raises(ValueError, match="no acTL"):
        decode_apng(encode_png(13, 9, f0))


def test_reject_paths():
    rng = np.random.default_rng(9)
    f0 = rng.integers(0, 256, (6, 8, 4)).astype(np.uint8)
    f1 = rng.integers(0, 256, (3, 3, 4)).astype(np.uint8)
    good = encode_apng(8, 6, [dict(rgba=f0), dict(rgba=f1, x=1, y=1)])
    # corrupt a CRC
    at = good.index(b"fcTL") + 4
    bad = bytearray(good); bad[at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|length|chunk"):
        decode_apng(bytes(bad))
    # acTL frame-count lie
    at = good.index(b"acTL") + 4
    bad = bytearray(good)
    struct.pack_into(">I", bad, at, 7)
    body = bad[at : at + 8]
    struct.pack_into(">I", bad, at + 8, zlib.crc32(b"acTL" + bytes(body)) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="claims 7 frames"):
        decode_apng(bytes(bad))
    # encoder validation
    with pytest.raises(ValueError, match="cover the canvas"):
        encode_apng(8, 6, [dict(rgba=f1)])
    with pytest.raises(ValueError, match="SOURCE"):
        encode_apng(8, 6, [dict(rgba=f0, blend=1)])
    with pytest.raises(ValueError, match="outside the canvas"):
        encode_apng(8, 6, [dict(rgba=f0), dict(rgba=f1, x=7, y=1)])
    with pytest.raises(ValueError, match="dispose/blend"):
        encode_apng(8, 6, [dict(rgba=f0, dispose=5)])


def test_sample_apng_frames_spark(spark):
    """The Spark sampling surface: every-k rendered canvases with exact
    sums matching a local composite; malformed rows degrade."""
    from river_spark.operators.apng import sample_apng_frames

    rng = np.random.default_rng(23)
    f0 = rng.integers(0, 256, (8, 10, 4)).astype(np.uint8)
    f1 = rng.integers(0, 256, (3, 4, 4)).astype(np.uint8)
    f2 = rng.integers(0, 256, (5, 6, 4)).astype(np.uint8)
    payload = encode_apng(10, 8, [
        dict(rgba=f0, dispose=1),
        dict(rgba=f1, x=2, y=2, blend=1, dispose=2),
        dict(rgba=f2, x=4, y=3),
    ])
    rendered = composite_apng(decode_apng(payload), all_frames=True)
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"junk"))],
        "doc_id long, payload binary",
    )
    rows = sample_apng_frames(df, "doc_id", "payload", every_k=2).collect()
    good = sorted((r for r in rows if r.doc_id == 1), key=lambda r: r.frame)
    assert [r.frame for r in good] == [0, 2]
    for r in good:
        canvas = rendered[r.frame]
        assert (r.width, r.height) == (10, 8) and r.n_frames == 3
        assert r.a_sum == int(canvas[:, :, 3].astype(np.int64).sum())
        flat = canvas.reshape(-1).astype(np.int64)
        p = np.arange(flat.size, dtype=np.int64)
        assert r.pos_weighted_sum == int(((p % 997 + 1) * flat).sum())
    assert not [r for r in rows if r.doc_id == 2][0].ok
