"""Indexed-color BMP (operators/bmp_indexed.py): lossless round trips
across depth x compression x orientation, the RLE delta escape against
a handcrafted stream (no encoder emits it), and reject paths. Pure
codec tests — no Spark."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from river_spark.operators.bmp_indexed import (
    decode_bmp_indexed,
    encode_bmp_indexed,
)

_SETTINGS = dict(max_examples=25, deadline=None, derandomize=True)


@given(
    seed=st.integers(0, 2**31 - 1),
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    layout=st.sampled_from(
        [(1, 0, 2), (4, 0, 16), (4, 0, 7), (8, 0, 256), (8, 0, 199),
         (8, 1, 256), (4, 2, 16)]
    ),
    top_down=st.booleans(),
    runs=st.booleans(),
)
@settings(**_SETTINGS)
def test_roundtrip_lossless(seed, w, h, layout, top_down, runs):
    bpp, comp, npal = layout
    if comp and top_down:
        top_down = False  # RLE is bottom-up only
    rng = np.random.default_rng(seed)
    if runs:  # long runs hit RLE encoded mode + sub-byte pack edges
        flat = np.repeat(rng.integers(0, npal, -(-w * h // 5)), 5)[: w * h]
        idx = flat.reshape(h, w).astype(np.uint8)
    else:
        idx = rng.integers(0, npal, (h, w)).astype(np.uint8)
    pal = rng.integers(0, 256, (npal, 3)).astype(np.uint8)
    payload = encode_bmp_indexed(w, h, idx, pal, bpp=bpp, compression=comp,
                                 top_down=top_down)
    W, H, B, C, out, p2 = decode_bmp_indexed(payload)
    assert (W, H, B, C) == (w, h, bpp, comp)
    assert np.array_equal(out, idx)
    assert np.array_equal(p2, pal)


def test_rle_delta_escape_handcrafted():
    """(0,2,dx,dy) moves the cursor right/up; skipped pixels read 0.
    Stream paints 3 pixels at the bottom-left, jumps dx=2 dy=1, paints
    2 more, then ends — everything else must be 0."""
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    base = encode_bmp_indexed(
        6, 3, np.zeros((3, 6), np.uint8), pal, bpp=8, compression=1
    )
    data_offset = struct.unpack_from("<I", base, 10)[0]
    stream = bytes(
        [3, 2,       # run: 3 pixels of index 2 at (x=0, bottom row)
         0, 2, 2, 1, # delta: x += 2 -> 5, y += 1 (one row up)
         1, 3,       # run: 1 pixel of index 3 at x=5 of middle row
         0, 1]       # end of bitmap
    )
    payload = bytearray(base[:data_offset]) + stream
    payload[2:6] = struct.pack("<I", len(payload))
    # biSizeImage field (offset 34) is advisory; leave as-is
    W, H, B, C, idx, _ = decode_bmp_indexed(bytes(payload))
    expect = np.zeros((3, 6), np.uint8)
    expect[2, 0:3] = 2      # bottom row (top-down index 2)
    expect[1, 5] = 3        # middle row after the delta
    assert np.array_equal(idx, expect)


def test_rle_absolute_word_alignment():
    """Odd-length absolute blocks are padded to even bytes on the wire;
    a decoder that forgets the pad desyncs and must not round-trip."""
    rng = np.random.default_rng(4)
    # literal row of 5 unique values -> absolute block of 5 (odd)
    idx = np.array([[10, 20, 30, 40, 50]], np.uint8)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    payload = encode_bmp_indexed(5, 1, idx, pal, bpp=8, compression=1)
    assert np.array_equal(decode_bmp_indexed(payload)[4], idx)
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    stream = payload[data_offset:]
    at = stream.index(bytes([0, 5]))
    assert len(stream) >= at + 2 + 6  # 5 pixels + 1 pad byte present


def test_biclrused_zero_means_full_table():
    rng = np.random.default_rng(6)
    idx = rng.integers(0, 16, (4, 4)).astype(np.uint8)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    payload = bytearray(encode_bmp_indexed(4, 4, idx, pal, bpp=4))
    struct.pack_into("<I", payload, 46, 0)  # biClrUsed = 0 -> 2^bpp
    W, H, B, C, out, p2 = decode_bmp_indexed(bytes(payload))
    assert p2.shape == (16, 3) and np.array_equal(out, idx)


def test_truecolor_path_untouched():
    from river_spark.operators.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (9, 7, 3)).astype(np.uint8)
    payload = encode_bmp(7, 9, img)
    w, h, out = decode_bmp(payload)
    assert (w, h) == (7, 9) and np.array_equal(out, img)
    with pytest.raises(ValueError, match="unsupported indexed BMP"):
        decode_bmp_indexed(payload)


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda d: b"XX" + d[2:], "not a BMP"),
        (lambda d: d[:60], "truncated"),
        # RLE stream cut before end-of-bitmap
        (lambda d: d[:-2], "end-of-bitmap|truncated"),
    ],
)
def test_reject_paths(mutate, msg):
    import re

    rng = np.random.default_rng(10)
    idx = rng.integers(0, 256, (5, 9)).astype(np.uint8)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    payload = encode_bmp_indexed(9, 5, idx, pal, bpp=8, compression=1)
    with pytest.raises(ValueError, match=re.compile(msg)):
        decode_bmp_indexed(mutate(payload))


def test_reject_rle_overflow_and_bad_args():
    rng = np.random.default_rng(12)
    idx = rng.integers(0, 4, (2, 4)).astype(np.uint8)
    pal = rng.integers(0, 256, (4, 3)).astype(np.uint8)
    payload = encode_bmp_indexed(4, 2, idx, pal, bpp=8, compression=1)
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    bad = bytearray(payload[:data_offset]) + bytes([200, 1, 0, 1])
    bad[2:6] = struct.pack("<I", len(bad))
    with pytest.raises(ValueError, match="overflows the row"):
        decode_bmp_indexed(bytes(bad))
    with pytest.raises(ValueError, match="RLE8 requires"):
        encode_bmp_indexed(4, 2, idx, pal, bpp=4, compression=1)
    with pytest.raises(ValueError, match="bottom-up only"):
        encode_bmp_indexed(4, 2, idx, pal, bpp=8, compression=1, top_down=True)
    with pytest.raises(ValueError, match="outside the palette"):
        encode_bmp_indexed(4, 2, idx + 10, pal, bpp=8)


# ---------------------------------------------------------------------------
# round-15: 16/32-bit truecolor (decode_bmp widening) — tested here with
# the other BMP variants even though the code lives in multimodal.py
# ---------------------------------------------------------------------------


def _build_bmp(w, h, bpp, comp, pixdata, masks=None):
    masks_b = struct.pack("<III", *masks) if comp == 3 else b""
    off = 14 + 40 + len(masks_b)
    return (b"BM" + struct.pack("<IHHI", off + len(pixdata), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, comp,
                          len(pixdata), 0, 0, 0, 0)
            + masks_b + pixdata)


def _rows16(vals, w, h, pack):
    rows = b""
    for r in range(h - 1, -1, -1):
        row = b"".join(struct.pack("<H", pack(r, c)) for c in range(w))
        rows += row + b"\x00" * ((-len(row)) % 4)
    return rows


def test_truecolor_32bit_bgrx():
    from river_spark.operators.multimodal import decode_bmp

    rng = np.random.default_rng(51)
    w, h = 5, 4
    px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    rows = b""
    for r in range(h - 1, -1, -1):
        rows += b"".join(bytes([px[r, c, 2], px[r, c, 1], px[r, c, 0], 0])
                         for c in range(w))
    W, H, out = decode_bmp(_build_bmp(w, h, 32, 0, rows))
    assert (W, H) == (w, h) and np.array_equal(out, px)


def test_truecolor_16bit_555_and_565():
    """BI_RGB 16-bit defaults to 555; BI_BITFIELDS carries explicit
    masks (565 here). Sub-8-bit channels widen by bit replication —
    the 0->0, max->255 endpoints a plain shift would miss."""
    from river_spark.operators.multimodal import decode_bmp

    rng = np.random.default_rng(53)
    w, h = 7, 3
    v5 = rng.integers(0, 32, (h, w, 3))
    rows = _rows16(v5, w, h, lambda r, c: (int(v5[r, c, 0]) << 10)
                   | (int(v5[r, c, 1]) << 5) | int(v5[r, c, 2]))
    W, H, out = decode_bmp(_build_bmp(w, h, 16, 0, rows))
    exp = ((v5 << 3) | (v5 >> 2)).astype(np.uint8)
    assert np.array_equal(out, exp)

    r5 = rng.integers(0, 32, (h, w)); g6 = rng.integers(0, 64, (h, w))
    b5 = rng.integers(0, 32, (h, w))
    rows = _rows16(r5, w, h, lambda r, c: (int(r5[r, c]) << 11)
                   | (int(g6[r, c]) << 5) | int(b5[r, c]))
    W, H, out = decode_bmp(_build_bmp(w, h, 16, 3, rows,
                                      masks=(0xF800, 0x07E0, 0x001F)))
    assert np.array_equal(out[:, :, 0], ((r5 << 3) | (r5 >> 2)).astype(np.uint8))
    assert np.array_equal(out[:, :, 1], ((g6 << 2) | (g6 >> 4)).astype(np.uint8))
    assert np.array_equal(out[:, :, 2], ((b5 << 3) | (b5 >> 2)).astype(np.uint8))


def test_truecolor_reject_bad_masks_and_variants():
    from river_spark.operators.multimodal import decode_bmp

    rows = b"\x00" * 8
    with pytest.raises(ValueError, match="non-contiguous|zero"):
        decode_bmp(_build_bmp(1, 1, 32, 3, rows, masks=(0xF0F0, 0x0F00, 0xF)))
    with pytest.raises(ValueError, match="BI_BITFIELDS"):
        decode_bmp(_build_bmp(1, 1, 24, 3, rows, masks=(1, 2, 4)))
    with pytest.raises(ValueError, match="unsupported BMP variant"):
        decode_bmp(_build_bmp(1, 1, 64, 0, rows))
