"""Round-trip and robustness tests for the baseline TIFF codec
(operators/tiff.py). The driver-gated query (mm_tiff_decode_stats) pins
the little-endian PackBits grayscale path; these tests cover the rest:
big-endian decode, RGB, uncompressed strips, PackBits edge cases, and
the reject paths."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from river_spark.operators.tiff import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
)


def test_packbits_edges():
    # empty
    assert packbits_encode(b"") == b""
    assert packbits_decode(b"", 0) == b""
    # single byte -> literal of 1
    assert packbits_decode(packbits_encode(b"A"), 1) == b"A"
    # exactly 128-run splits (max run header is 129 repeats? no: 257-h,
    # h in [129,255] -> runs of 2..128)
    data = b"B" * 300
    assert packbits_decode(packbits_encode(data), 300) == data
    # literal stretch > 128
    data = bytes(range(256)) * 2
    assert packbits_decode(packbits_encode(data), len(data)) == data
    # 2-runs inside literals stay literal but still decode
    data = b"aabbccddee"
    assert packbits_decode(packbits_encode(data), len(data)) == data
    # noop header skipped
    assert packbits_decode(b"\x80\x00A", 1) == b"A"
    with pytest.raises(ValueError):
        packbits_decode(b"\x05AB", 6)  # literal past end
    with pytest.raises(ValueError):
        packbits_decode(b"", 1)  # underrun


def test_roundtrip_matrix():
    rng = np.random.default_rng(2)
    for shape, rps, comp in [
        ((13, 22), 4, 32773),   # partial final strip
        ((12, 20), 4, 32773),   # exact strips
        ((5, 9), 100, 32773),   # single strip larger than image
        ((13, 22), 4, 1),       # uncompressed
        ((8, 6, 3), 3, 32773),  # RGB chunky
        ((1, 1), 1, 32773),     # degenerate
    ]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        w, h, px = decode_tiff(encode_tiff(img, rows_per_strip=rps, compression=comp))
        assert (w, h) == (shape[1], shape[0])
        assert (px == img).all(), (shape, rps, comp)


def test_big_endian_decode():
    """Hand-built MM (Motorola) file: 2x2 grayscale, uncompressed,
    single strip, inline strip offset/count."""
    pix = bytes([10, 20, 30, 40])
    # layout: header(8) pixels(4) IFD
    ifd_off = 12
    out = bytearray(b"MM\x00\x2a")
    out += struct.pack(">I", ifd_off)
    out += pix
    entries = [
        (256, 3, 1, 2),    # width
        (257, 3, 1, 2),    # length
        (258, 3, 1, 8),    # bits per sample
        (259, 3, 1, 1),    # no compression
        (262, 3, 1, 1),
        (273, 4, 1, 8),    # strip offset -> pixels
        (277, 3, 1, 1),
        (278, 4, 1, 2),
        (279, 4, 1, 4),
    ]
    out += struct.pack(">H", len(entries))
    for tag, typ, count, val in entries:
        out += struct.pack(">HHI", tag, typ, count)
        out += struct.pack(">I", val << 16 if typ == 3 else val)
    out += b"\x00\x00\x00\x00"
    w, h, px = decode_tiff(bytes(out))
    assert (w, h) == (2, 2)
    assert px.tolist() == [[10, 20], [30, 40]]


def test_reject_paths():
    img = np.zeros((4, 4), dtype=np.uint8)
    data = bytearray(encode_tiff(img))
    with pytest.raises(ValueError):
        decode_tiff(b"XX" + bytes(data[2:]))  # byte order
    bad = bytearray(data)
    bad[2] = 41  # wrong magic
    with pytest.raises(ValueError):
        decode_tiff(bytes(bad))
    with pytest.raises(ValueError):
        decode_tiff(bytes(data[:20]))  # truncated IFD
    with pytest.raises(ValueError):
        encode_tiff(np.zeros((4, 4, 2), dtype=np.uint8))  # 2 samples
    with pytest.raises(ValueError):
        encode_tiff(img, compression=7)  # JPEG-in-TIFF not in subset
    with pytest.raises(ValueError):
        encode_tiff(img, predictor=3)  # floating-point predictor


def test_spark_stats_path(spark):
    from river_spark.operators.tiff import decode_tiff_pixel_stats

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = encode_tiff(img)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"II*\x00garbage"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_tiff_pixel_stats(df, "doc_id", "payload").collect()}
    assert rows[2]["ok"] is False
    r1 = rows[1]
    flat = img.reshape(-1).astype(np.int64)
    p = np.arange(64, dtype=np.int64)
    assert r1["ok"] and r1["pix_sum"] == int(flat.sum())
    assert r1["pos_weighted_sum"] == int(((p % 997 + 1) * flat).sum())
    assert r1["n_bright"] == 0


# ---------------------------------------------------------------------------
# round-13: LZW (Compression 5) + horizontal-differencing predictor
# ---------------------------------------------------------------------------


def test_lzw_roundtrips_across_width_boundaries():
    from river_spark.operators.tiff import lzw_decode, lzw_encode

    rng = np.random.default_rng(3)
    cases = [
        b"",
        b"a" * 10000,                                    # single run
        bytes(np.arange(256, dtype=np.uint8)) * 40,      # 9->12 bits
        bytes(rng.integers(0, 4, 30000).astype(np.uint8)),
        bytes(rng.integers(0, 256, 200000).astype(np.uint8)),  # clears
    ]
    for d in cases:
        assert lzw_decode(lzw_encode(d), len(d)) == d


def test_lzw_reject_paths():
    from river_spark.operators.tiff import lzw_decode, lzw_encode

    with pytest.raises(ValueError):
        lzw_decode(b"\x00\x00", 100)                    # underrun
    good = lzw_encode(b"hello world")
    with pytest.raises(ValueError):
        lzw_decode(good, 100)                           # wrong expected
    # a code past the table end is malformed
    with pytest.raises(ValueError):
        # CLEAR(256) then code 300 at 9 bits: 100000000 100101100 pad
        lzw_decode(bytes([0b10000000, 0b01001011, 0b00000000]), 4)


def test_predictor_roundtrip_and_compression_win():
    from river_spark.operators.tiff import (
        _predict_rows,
        _unpredict_rows,
        encode_tiff,
    )

    rng = np.random.default_rng(5)
    for spp in (1, 3):
        rb = 24 * spp
        d = bytes(rng.integers(0, 256, rb * 7).astype(np.uint8))
        assert _unpredict_rows(_predict_rows(d, rb, spp), rb, spp) == d
    # a smooth gradient must compress far better WITH the predictor
    i = (np.arange(64)[:, None] * 2 + np.arange(96)[None, :]).astype(np.uint8)
    plain = len(encode_tiff(i, 8, compression=5, predictor=1))
    pred = len(encode_tiff(i, 8, compression=5, predictor=2))
    assert pred < plain / 2


def test_tiff_lzw_predictor_full_matrix():
    from river_spark.operators.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(7)
    for shape in [(12, 20), (13, 23, 3), (8, 8), (10, 17, 3)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        for comp in (1, 5, 32773):
            for pred in (1, 2):
                data = encode_tiff(img, rows_per_strip=4,
                                   compression=comp, predictor=pred)
                w, h, px = decode_tiff(data)
                np.testing.assert_array_equal(px, img)


def test_tiff_rgb_stats_spark_path(spark):
    from river_spark.operators.tiff import decode_tiff_rgb_stats, encode_tiff

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (10, 16, 3)).astype(np.uint8)
    gray = rng.integers(0, 256, (6, 6)).astype(np.uint8)
    good = encode_tiff(img, rows_per_strip=3, compression=5, predictor=2)
    df = spark.createDataFrame(
        [(1, bytearray(good)),
         (2, bytearray(encode_tiff(gray))),       # grayscale: rejected
         (3, bytearray(b"II*\x00junk"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r
            for r in decode_tiff_rgb_stats(df, "doc_id", "payload").collect()}
    assert rows[2]["ok"] is False and rows[3]["ok"] is False
    r1 = rows[1]
    p64 = img.astype(np.int64)
    wgt = (np.arange(160, dtype=np.int64) % 997 + 1).reshape(10, 16)
    assert r1["ok"] and (r1["width"], r1["height"]) == (16, 10)
    assert r1["r_sum"] == int(p64[:, :, 0].sum())
    assert r1["g_sum"] == int(p64[:, :, 1].sum())
    assert r1["b_sum"] == int(p64[:, :, 2].sum())
    assert r1["pos_weighted_r"] == int((wgt * p64[:, :, 0]).sum())


# ---------------------------------------------------------------------------
# Round 14: tiled layout (TIFF 6.0 §15) — scanned/archival and geo
# TIFFs use tiles; same entropy layer (none/LZW/PackBits + predictor).
# ---------------------------------------------------------------------------

def _img(shape, seed=7):
    return np.random.default_rng(seed).integers(0, 256, shape).astype(np.uint8)


@pytest.mark.parametrize("comp", [1, 5, 32773], ids=["none", "lzw", "packbits"])
@pytest.mark.parametrize("pred", [1, 2])
def test_tiled_roundtrip_full_matrix(comp, pred):
    # 37x53 at 16x16 tiles: partial tiles on BOTH edges
    for shape in [(37, 53), (37, 53, 3)]:
        img = _img(shape)
        data = encode_tiff(img, compression=comp, predictor=pred,
                           tile_size=(16, 16))
        w, h, out = decode_tiff(data)
        assert (w, h) == (53, 37)
        assert np.array_equal(out, img)


def test_tiled_rectangular_tiles_and_exact_grid():
    img = _img((64, 96, 3), seed=11)     # exact multiple: no padding
    data = encode_tiff(img, compression=5, predictor=2, tile_size=(32, 16))
    assert np.array_equal(decode_tiff(data)[2], img)
    img2 = _img((20, 18), seed=12)       # smaller than one tile
    data2 = encode_tiff(img2, compression=32773, tile_size=(32, 32))
    assert np.array_equal(decode_tiff(data2)[2], img2)


def test_tiled_wire_differs_from_strips_and_tags_present():
    img = _img((32, 32))
    tiled = encode_tiff(img, tile_size=(16, 16))
    striped = encode_tiff(img)
    assert tiled != striped
    # TileWidth tag (322) on the tiled wire only
    import struct as _s
    def has_tag(data, tag):
        (ifd,) = _s.unpack_from("<I", data, 4)
        (n,) = _s.unpack_from("<H", data, ifd)
        return tag in [_s.unpack_from("<H", data, ifd + 2 + 12 * i)[0]
                       for i in range(n)]
    assert has_tag(tiled, 322) and has_tag(tiled, 324)
    assert not has_tag(tiled, 273) and not has_tag(tiled, 278)
    assert has_tag(striped, 273) and not has_tag(striped, 322)


def test_tiled_reject_paths():
    img = _img((32, 32))
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff(img, tile_size=(15, 16))
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff(img, tile_size=(16, 0))
    data = bytearray(encode_tiff(img, tile_size=(16, 16), compression=1))
    # corrupt TileWidth (322) value to 8: find its IFD entry
    import struct as _s
    (ifd,) = _s.unpack_from("<I", data, 4)
    (n,) = _s.unpack_from("<H", data, ifd)
    for i in range(n):
        o = ifd + 2 + 12 * i
        tag, typ, cnt = _s.unpack_from("<HHI", data, o)
        if tag == 322:
            _s.pack_into("<I", data, o + 8, 8)
    with pytest.raises(ValueError, match="multiples of 16"):
        decode_tiff(bytes(data))
    # tile count not matching the grid: truncate offsets via TileLength bump
    data2 = bytearray(encode_tiff(img, tile_size=(16, 16), compression=1))
    (ifd,) = _s.unpack_from("<I", data2, 4)
    (n,) = _s.unpack_from("<H", data2, ifd)
    for i in range(n):
        o = ifd + 2 + 12 * i
        tag, typ, cnt = _s.unpack_from("<HHI", data2, o)
        if tag == 323:
            _s.pack_into("<I", data2, o + 8, 32)  # claims 1 row of tiles
    with pytest.raises(ValueError, match="grid"):
        decode_tiff(bytes(data2))


def test_tiled_padding_never_leaks_into_pixels():
    # constant image with partial edge tiles: any padding leak would
    # change the constant
    img = np.full((17, 33, 3), 200, dtype=np.uint8)
    data = encode_tiff(img, compression=5, predictor=2, tile_size=(16, 16))
    _, _, out = decode_tiff(data)
    assert (out == 200).all() and out.shape == (17, 33, 3)


def test_tiled_header_allocation_bomb_rejected():
    # a lying TileLength must land as ValueError BEFORE the grid
    # allocation, so the Spark stats ops (which catch ValueError) see
    # ok=false instead of an executor-side MemoryError
    img = _img((32, 32))
    data = bytearray(encode_tiff(img, tile_size=(16, 16), compression=1))
    import struct as _s
    (ifd,) = _s.unpack_from("<I", data, 4)
    (n,) = _s.unpack_from("<H", data, ifd)
    for i in range(n):
        o = ifd + 2 + 12 * i
        tag, typ, cnt = _s.unpack_from("<HHI", data, o)
        if tag in (322, 323):
            _s.pack_into("<I", data, o + 8, 1 << 20)  # 1M x 1M tiles
    with pytest.raises(ValueError):
        decode_tiff(bytes(data))


def test_tag_count_bomb_rejected_quickly():
    # a corrupted IFD tag count must reject BEFORE building the unpack
    # format string (a 2^30 count would allocate gigabytes and hang the
    # executor, which the Spark stats ops could never catch)
    import struct as _s
    import time
    img = _img((16, 16))
    data = bytearray(encode_tiff(img, compression=1))
    (ifd,) = _s.unpack_from("<I", data, 4)
    (n,) = _s.unpack_from("<H", data, ifd)
    o = ifd + 2  # first entry: corrupt its count field
    _s.pack_into("<I", data, o + 4, 1 << 30)
    t0 = time.perf_counter()
    with pytest.raises(ValueError, match="larger than the file"):
        decode_tiff(bytes(data))
    assert time.perf_counter() - t0 < 1.0


def test_deflate_and_16bit_matrix():
    """Round-15 widening: Deflate strips/tiles (compression 8, plus the
    old-style 32946 alias on decode) and 16-bit samples — lossless
    across dtype x compression x predictor x layout, gray and RGB."""
    rng = np.random.default_rng(31)
    for dt, hi in [(np.uint8, 256), (np.uint16, 65536)]:
        for comp in (1, 5, 8, 32773):
            for pred in (1, 2):
                for tile in (None, (16, 16)):
                    for shape in [(9, 13), (17, 23, 3)]:
                        img = rng.integers(0, hi, shape).astype(dt)
                        w, h, out = decode_tiff(encode_tiff(
                            img, compression=comp, predictor=pred,
                            tile_size=tile))
                        assert out.dtype == dt and np.array_equal(out, img)


def test_deflate_32946_alias_decodes():
    """The old-style Deflate tag (32946) decodes identically to 8."""
    import struct as _s

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    payload = bytearray(encode_tiff(img, compression=8))
    # rewrite the Compression SHORT value 8 -> 32946 in the IFD
    (ifd_off,) = _s.unpack_from("<I", payload, 4)
    (n_ent,) = _s.unpack_from("<H", payload, ifd_off)
    for i in range(n_ent):
        o = ifd_off + 2 + 12 * i
        tag, typ, cnt = _s.unpack_from("<HHI", payload, o)
        if tag == 259:
            _s.pack_into("<H", payload, o + 8, 32946)
    w, h, out = decode_tiff(bytes(payload))
    assert np.array_equal(out, img)


def test_16bit_predictor_differs_on_sample_units():
    """§14 differencing operates on 16-bit sample VALUES: a value
    straddling a byte boundary (e.g. 0x0100) must difference as one
    unit. A byte-wise predictor would corrupt the round trip."""
    img = np.array([[0x00FF, 0x0100, 0x0101, 0xFFFF]], dtype=np.uint16)
    for comp in (1, 8):
        w, h, out = decode_tiff(encode_tiff(img, compression=comp,
                                            predictor=2))
        assert np.array_equal(out, img)


def test_deflate_reject_paths():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    payload = bytearray(encode_tiff(img, compression=8, rows_per_strip=8))
    # corrupt the deflate stream body (strip data starts at offset 8)
    payload[12] ^= 0xFF
    with pytest.raises(ValueError, match="deflate|mismatch"):
        decode_tiff(bytes(payload))
    # mixed bit depths reject
    rgb = np.zeros((4, 4, 3), np.uint8)
    data = bytearray(encode_tiff(rgb))
    import struct as _s
    (ifd_off,) = _s.unpack_from("<I", data, 4)
    (n_ent,) = _s.unpack_from("<H", data, ifd_off)
    for i in range(n_ent):
        o = ifd_off + 2 + 12 * i
        tag, typ, cnt = _s.unpack_from("<HHI", data, o)
        if tag == 258 and cnt == 3:
            (voff,) = _s.unpack_from("<I", data, o + 8)
            _s.pack_into("<H", data, voff, 16)  # one channel 16, rest 8
    with pytest.raises(ValueError, match="uniform"):
        decode_tiff(bytes(data))


def test_palette_photometric3_matrix():
    """Round-15: photometric 3 — HxW uint8 indices + 768-entry 16-bit
    ColorMap (R..G..B planes, §5), expanded to HxWx3 uint16 on decode,
    across every compression/predictor/layout."""
    rng = np.random.default_rng(41)
    idx = rng.integers(0, 256, (11, 14)).astype(np.uint8)
    cm = rng.integers(0, 65536, (256, 3)).astype(np.uint16)
    for comp in (1, 5, 8, 32773):
        for pred in (1, 2):
            for tile in (None, (16, 16)):
                w, h, out = decode_tiff(encode_tiff(
                    idx, compression=comp, predictor=pred,
                    tile_size=tile, colormap=cm))
                assert out.shape == (11, 14, 3) and out.dtype == np.uint16
                assert np.array_equal(out, cm[idx])


def test_palette_reject_paths():
    rng = np.random.default_rng(43)
    idx = rng.integers(0, 256, (4, 4)).astype(np.uint8)
    cm = rng.integers(0, 65536, (256, 3)).astype(np.uint16)
    with pytest.raises(ValueError, match="indices"):
        encode_tiff(idx.astype(np.uint16), colormap=cm)
    with pytest.raises(ValueError, match="colormap"):
        encode_tiff(idx, colormap=cm[:16])
    # a photometric-3 file whose ColorMap tag is missing must reject
    payload = bytearray(encode_tiff(idx, colormap=cm))
    (ifd_off,) = struct.unpack_from("<I", payload, 4)
    (n_ent,) = struct.unpack_from("<H", payload, ifd_off)
    for i in range(n_ent):
        o = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from("<HHI", payload, o)
        if tag == 320:
            struct.pack_into("<H", payload, o, 65000)  # rename the tag away
    with pytest.raises(ValueError, match="ColorMap"):
        decode_tiff(bytes(payload))
