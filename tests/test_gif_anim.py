"""GIF89a animation layer (operators/gif.py): lossless multi-frame
round trips under randomized knobs, compositing semantics against a
hand-built numpy reference (the sequential disposal/transparency logic
the SQL oracle can't express), interlace pinning against the plain
path, and the reject paths. No Spark involved — pure codec tests, so
hypothesis example counts can be generous."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from river_spark.operators.gif import (
    _interlace_row_order,
    composite_gif_anim,
    decode_gif_anim,
    encode_gif_anim,
)

_SETTINGS = dict(max_examples=25, deadline=None, derandomize=True)


def _rand_anim(rng, n_frames, sw, sh, gct_n=256):
    """Random animation: sub-rect frames, mixed local tables / sizes,
    transparency, interlace, all disposal methods."""
    gct = rng.integers(0, 256, (gct_n, 3)).astype(np.uint8)
    frames = []
    for f in range(n_frames):
        fw = int(rng.integers(1, sw + 1))
        fh = int(rng.integers(1, sh + 1))
        left = int(rng.integers(0, sw - fw + 1))
        top = int(rng.integers(0, sh - fh + 1))
        lct_n = int(rng.choice([0, 2, 4, 16, 64]))
        lct = (
            rng.integers(0, 256, (lct_n, 3)).astype(np.uint8) if lct_n else None
        )
        tbl_n = lct_n or gct_n
        idx = rng.integers(0, tbl_n, (fh, fw)).astype(np.uint8)
        transparent = int(rng.integers(0, tbl_n)) if rng.random() < 0.5 else None
        frames.append(
            dict(
                left=left,
                top=top,
                indices=idx,
                local_palette=lct,
                transparent=transparent,
                interlace=bool(rng.random() < 0.5),
                disposal=int(rng.integers(0, 4)),
                delay=int(rng.integers(0, 1000)),
            )
        )
    return gct, frames


@given(
    seed=st.integers(0, 2**31 - 1),
    n_frames=st.integers(1, 6),
    sw=st.integers(1, 40),
    sh=st.integers(1, 40),
    gct_n=st.sampled_from([2, 4, 16, 256]),
)
@settings(**_SETTINGS)
def test_anim_roundtrip_lossless(seed, n_frames, sw, sh, gct_n):
    """Every frame's indices, geometry, table choice, GCE fields, and
    the screen/loop metadata survive encode -> decode bit-exactly."""
    rng = np.random.default_rng(seed)
    gct, frames = _rand_anim(rng, n_frames, sw, sh, gct_n)
    bg = int(rng.integers(0, gct_n))
    loop = int(rng.integers(0, 500))
    payload = encode_gif_anim(sw, sh, gct, frames, bg_index=bg, loop=loop,
                              comment=b"x" * int(rng.integers(0, 600)))
    anim = decode_gif_anim(payload)
    assert (anim["width"], anim["height"]) == (sw, sh)
    assert anim["bg_index"] == bg and anim["loop"] == loop
    assert np.array_equal(anim["global_palette"], gct)
    assert len(anim["frames"]) == len(frames)
    for fin, fout in zip(frames, anim["frames"]):
        assert (fout["left"], fout["top"]) == (fin["left"], fin["top"])
        assert np.array_equal(fout["indices"], fin["indices"])
        assert fout["local"] == (fin["local_palette"] is not None)
        expected_tbl = (
            fin["local_palette"] if fin["local_palette"] is not None else gct
        )
        assert np.array_equal(fout["palette"], expected_tbl)
        assert fout["transparent"] == fin["transparent"]
        assert fout["disposal"] == fin["disposal"]
        assert fout["interlaced"] == fin["interlace"]
        assert fout["delay"] == fin["delay"]


@given(seed=st.integers(0, 2**31 - 1), n_frames=st.integers(1, 5))
@settings(**_SETTINGS)
def test_compositing_matches_numpy_reference(seed, n_frames):
    """Disposal 0/1 (leave), 2 (restore rect to background), 3 (restore
    to previous) and transparency holes, replayed independently with
    plain numpy indexing over the DECODED frames."""
    rng = np.random.default_rng(seed)
    sw, sh = int(rng.integers(4, 24)), int(rng.integers(4, 24))
    gct, frames = _rand_anim(rng, n_frames, sw, sh)
    bg = int(rng.integers(0, 256))
    payload = encode_gif_anim(sw, sh, gct, frames, bg_index=bg)
    anim = decode_gif_anim(payload)
    rendered = composite_gif_anim(anim, all_frames=True)
    final = composite_gif_anim(anim)

    canvas = np.empty((sh, sw, 3), np.uint8)
    canvas[:] = gct[bg]
    for f, (fr, got) in enumerate(zip(frames, rendered)):
        before = canvas.copy()
        idx = fr["indices"]
        tbl = fr["local_palette"] if fr["local_palette"] is not None else gct
        for y in range(idx.shape[0]):
            for x in range(idx.shape[1]):
                v = int(idx[y, x])
                if fr["transparent"] is not None and v == fr["transparent"]:
                    continue
                canvas[fr["top"] + y, fr["left"] + x] = tbl[v]
        assert np.array_equal(got, canvas), f"frame {f} render"
        if fr["disposal"] == 2:
            canvas[
                fr["top"] : fr["top"] + idx.shape[0],
                fr["left"] : fr["left"] + idx.shape[1],
            ] = gct[bg]
        elif fr["disposal"] == 3:
            canvas = before
    assert np.array_equal(final, canvas)


def test_interlace_row_order_is_the_spec_table():
    # GIF89a appendix E: pass 1 rows 0,8,16..; pass 2 rows 4,12..;
    # pass 3 rows 2,6,10..; pass 4 rows 1,3,5..
    assert _interlace_row_order(10) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    assert _interlace_row_order(1) == [0]
    assert _interlace_row_order(4) == [0, 2, 1, 3]
    for h in range(1, 40):
        order = _interlace_row_order(h)
        assert sorted(order) == list(range(h))


def test_interlaced_equals_plain_decode():
    """The same pixels through the interlaced and sequential paths
    decode identically — a matched encode/decode pass bug cannot
    cancel because the sequential path never reorders rows."""
    rng = np.random.default_rng(7)
    gct = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    idx = rng.integers(0, 256, (13, 9)).astype(np.uint8)
    plain = encode_gif_anim(9, 13, gct, [dict(indices=idx)])
    inter = encode_gif_anim(9, 13, gct, [dict(indices=idx, interlace=True)])
    assert plain != inter  # the wire genuinely differs
    a = decode_gif_anim(plain)["frames"][0]["indices"]
    b = decode_gif_anim(inter)["frames"][0]["indices"]
    assert np.array_equal(a, idx) and np.array_equal(b, idx)


def test_gce_applies_to_one_image_only():
    """A GCE covers exactly the NEXT image descriptor; the following
    frame reverts to defaults (opaque, disposal 0, delay 0)."""
    rng = np.random.default_rng(3)
    gct = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    idx = rng.integers(0, 256, (4, 4)).astype(np.uint8)
    payload = encode_gif_anim(
        4, 4, gct,
        [dict(indices=idx, transparent=5, disposal=3, delay=9),
         dict(indices=idx)],
    )
    f0, f1 = decode_gif_anim(payload)["frames"]
    assert (f0["transparent"], f0["disposal"], f0["delay"]) == (5, 3, 9)
    assert (f1["transparent"], f1["disposal"], f1["delay"]) == (None, 0, 0)


def test_decode_accepts_87a_single_frame():
    """The anim decoder subsumes the 87a path: encode_gif output (no
    extensions) decodes as a one-frame animation."""
    from river_spark.operators.multimodal import encode_gif

    rng = np.random.default_rng(11)
    idx = rng.integers(0, 256, (10, 12)).astype(np.uint8)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    anim = decode_gif_anim(encode_gif(12, 10, idx, pal))
    assert anim["loop"] is None and len(anim["frames"]) == 1
    assert np.array_equal(anim["frames"][0]["indices"], idx)
    assert np.array_equal(anim["frames"][0]["palette"], pal)


def _valid_payload():
    rng = np.random.default_rng(5)
    gct = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, (6, 8)).astype(np.uint8)
    return encode_gif_anim(
        12, 9, gct,
        [dict(left=2, top=1, indices=idx, transparent=3, interlace=True,
              disposal=2, delay=7),
         dict(indices=idx)],
        bg_index=4, loop=2,
    )


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda d: b"JIF89a" + d[6:], "not a GIF"),
        (lambda d: d[:20], "screen|table|trailer|truncated|unterminated"),
        (lambda d: d[:-1], "trailer|unterminated|truncated"),
        # flip the frame rectangle outside the 12x9 screen
        (lambda d: d.replace(b"\x2c\x02\x00\x01\x00",
                             b"\x2c\x0b\x00\x01\x00"), "outside"),
    ],
)
def test_reject_paths(mutate, msg):
    import re

    payload = _valid_payload()
    bad = mutate(payload)
    assert bad != payload
    with pytest.raises(ValueError, match=re.compile(msg)):
        decode_gif_anim(bad)


def test_reject_oversized_screen():
    import struct

    payload = bytearray(_valid_payload())
    payload[6:10] = struct.pack("<HH", 65535, 65535)
    with pytest.raises(ValueError, match="allocation bound"):
        decode_gif_anim(bytes(payload))


def test_encoder_validates_inputs():
    rng = np.random.default_rng(9)
    gct = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    idx = rng.integers(0, 256, (4, 4)).astype(np.uint8)
    with pytest.raises(ValueError, match="outside the logical screen"):
        encode_gif_anim(4, 4, gct, [dict(left=1, indices=idx)])
    with pytest.raises(ValueError, match="outside its color table"):
        encode_gif_anim(4, 4, gct[:16].copy(), [dict(indices=idx)])
    with pytest.raises(ValueError, match="power of two"):
        encode_gif_anim(4, 4, gct[:3].copy(), [dict(indices=idx % 3)])
    with pytest.raises(ValueError, match="disposal"):
        encode_gif_anim(4, 4, gct, [dict(indices=idx, disposal=5)])


def test_sample_gif_anim_frames_spark(spark):
    """The Spark sampling surface: every-k rendered canvases with exact
    sums matching a local composite; malformed rows degrade to
    ok=False."""
    from river_spark.operators.gif import sample_gif_anim_frames

    rng = np.random.default_rng(17)
    gct = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    frames = [
        dict(left=1, top=2, indices=rng.integers(0, 256, (5, 6)).astype(np.uint8),
             disposal=2, delay=3),
        dict(indices=rng.integers(0, 16, (4, 4)).astype(np.uint8),
             local_palette=gct[:16].copy(), transparent=1, interlace=True),
        dict(left=3, indices=rng.integers(0, 256, (6, 7)).astype(np.uint8)),
    ]
    payload = encode_gif_anim(12, 9, gct, frames, bg_index=5)
    rendered = composite_gif_anim(decode_gif_anim(payload), all_frames=True)

    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"not a gif"))],
        "doc_id long, payload binary",
    )
    rows = sample_gif_anim_frames(df, "doc_id", "payload", every_k=2).collect()
    good = sorted((r for r in rows if r.doc_id == 1), key=lambda r: r.frame)
    assert [r.frame for r in good] == [0, 2]
    for r in good:
        canvas = rendered[r.frame]
        assert (r.width, r.height) == (12, 9) and r.n_frames == 3
        assert r.r_sum == int(canvas[:, :, 0].astype(np.int64).sum())
        flat = canvas.reshape(-1).astype(np.int64)
        p = np.arange(flat.size, dtype=np.int64)
        assert r.pos_weighted_sum == int(((p % 997 + 1) * flat).sum())
    bad = [r for r in rows if r.doc_id == 2]
    assert len(bad) == 1 and not bad[0].ok
