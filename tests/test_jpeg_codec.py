"""Round-trip and format-robustness tests for the baseline JPEG codec
(operators/jpeg.py). The driver-gated query (mm_jpeg_decode_stats) pins
the DC-only closed form; these tests cover what constant blocks can't:
AC coefficient coding, ZRL runs, byte stuffing, restart resets, marker
skipping, and the reject paths.

The exactness contract under test: decode(encode(img)) must equal the
pinned integer model fdct -> round-half-up quantize -> dequant -> idct
applied per block — bit-for-bit, not approximately."""

from __future__ import annotations

import numpy as np
import pytest

from river_spark.operators.jpeg import (
    QUANT_FLAT16,
    QUANT_FLAT17,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    fdct8x8_int,
    idct8x8_int,
    ycbcr_to_rgb_int,
)


def _model(img: np.ndarray, q: np.ndarray) -> np.ndarray:
    out = np.zeros_like(img)
    for by in range(img.shape[0] // 8):
        for bx in range(img.shape[1] // 8):
            b = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(np.int64) - 128
            c = fdct8x8_int(b).reshape(64)
            qc = np.floor_divide(2 * c + q, 2 * q)
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = idct8x8_int(
                (qc * q).reshape(8, 8)
            )
    return out


def test_constant_block_closed_form():
    """The oracle's arithmetic, asserted against the real codec for
    every possible constant value."""
    for v in range(256):
        plane = np.full((8, 8), v, dtype=np.uint8)
        w, h, planes = decode_jpeg(encode_jpeg([plane]))
        n = v - 128
        F = (n * 8589582400 + 536870912) >> 30
        qc = (2 * F + 16) >> 5
        pix = ((134212225 * (qc * 16) + 536870912) >> 30) + 128
        pix = max(0, min(255, pix))
        assert (planes[0] == pix).all(), v


def test_random_grayscale_matches_integer_model():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    w, h, planes = decode_jpeg(encode_jpeg([img]))
    assert (w, h) == (32, 24) and len(planes) == 1
    assert (planes[0] == _model(img, QUANT_FLAT16)).all()


def test_random_color_with_restarts_matches_model():
    rng = np.random.default_rng(11)
    y, cb, cr = (rng.integers(0, 256, size=(16, 40), dtype=np.uint8) for _ in range(3))
    data = encode_jpeg([y, cb, cr], restart_interval=3)
    assert b"\xff\xd0" in data  # RST0 actually emitted
    w, h, planes = decode_jpeg(data)
    assert (planes[0] == _model(y, QUANT_FLAT16)).all()
    assert (planes[1] == _model(cb, QUANT_FLAT17)).all()
    assert (planes[2] == _model(cr, QUANT_FLAT17)).all()


def test_byte_stuffing_roundtrip():
    """Seed 6 provably produces an 0xFF entropy byte (stuffed to
    FF 00); the decoder must unstuff it, not stop at a phantom
    marker."""
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    data = encode_jpeg([img])
    sos = data.find(b"\xff\xda")
    assert b"\xff\x00" in data[sos:-2]
    _, _, planes = decode_jpeg(data)
    assert (planes[0] == _model(img, QUANT_FLAT16)).all()


def test_zrl_long_zero_run():
    """A block whose only surviving AC coefficient is the LAST zigzag
    position forces three ZRL (run-16) codes before it."""
    coef = np.zeros((8, 8), dtype=np.int64)
    coef[7, 7] = 320  # zigzag index 63; survives /16 quantization
    img = idct8x8_int(coef)
    data = encode_jpeg([img])
    _, _, planes = decode_jpeg(data)
    assert (planes[0] == _model(img, QUANT_FLAT16)).all()
    # and the encode genuinely kept a coefficient at zigzag 63
    b = img.astype(np.int64) - 128
    zz = np.floor_divide(2 * fdct8x8_int(b).reshape(64) + 16, 32)[ZIGZAG]
    assert zz[63] != 0 and (zz[1:63] == 0).all()


def test_appn_and_com_segments_skipped():
    img = np.full((8, 8), 77, dtype=np.uint8)
    data = bytearray(encode_jpeg([img]))
    # splice APP0 (JFIF-ish) and COM right after SOI
    app0 = b"\xff\xe0" + (14).to_bytes(2, "big") + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01"
    com = b"\xff\xfe" + (7).to_bytes(2, "big") + b"hello"
    data[2:2] = app0 + com
    w, h, planes = decode_jpeg(bytes(data))
    assert (planes[0] == _model(img, QUANT_FLAT16)).all()


def test_dc_prediction_resets_at_restart():
    """Two images identical except for restart interval must both
    decode exactly — catching a decoder that forgets to reset the DC
    predictor (the values would smear after the first RST)."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(8, 64), dtype=np.uint8)
    a = decode_jpeg(encode_jpeg([img]))[2][0]
    b = decode_jpeg(encode_jpeg([img], restart_interval=1))[2][0]
    assert (a == b).all()


def test_reject_paths():
    img = np.full((8, 8), 10, dtype=np.uint8)
    data = encode_jpeg([img])
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01" + data[2:])  # no SOI
    with pytest.raises(ValueError):
        decode_jpeg(data.replace(b"\xff\xc0", b"\xff\xc2", 1))  # progressive
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg(data[: len(data) // 2])  # truncated scan
    with pytest.raises(ValueError):
        encode_jpeg([np.zeros((10, 8), dtype=np.uint8)])  # non-multiple-of-8
    with pytest.raises(ValueError):
        encode_jpeg([img, img])  # 2 planes


def test_foreign_quant_table_is_honored():
    """The decoder must dequantize with the table FROM THE FILE, not
    assume the default: encode with a non-flat luma table and check the
    model with that same table."""
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    q = (np.arange(64, dtype=np.int64) % 23) + 4
    data = encode_jpeg([img], quant_luma=q)
    _, _, planes = decode_jpeg(data)
    assert (planes[0] == _model(img, q)).all()
    # different table => genuinely different reconstruction
    assert (planes[0] != _model(img, QUANT_FLAT16)).any()


def test_ycbcr_to_rgb_kernel_pinned():
    """Spot values of the integer color kernel (the oracle mirrors
    these exact expressions)."""
    y = np.array([[128]], dtype=np.uint8)
    cb = np.array([[128]], dtype=np.uint8)
    cr = np.array([[128]], dtype=np.uint8)
    r, g, b = ycbcr_to_rgb_int(y, cb, cr)
    assert (int(r), int(g), int(b)) == (128, 128, 128)
    y = np.array([[100]], dtype=np.uint8)
    cb = np.array([[200]], dtype=np.uint8)
    cr = np.array([[50]], dtype=np.uint8)
    r, g, b = ycbcr_to_rgb_int(y, cb, cr)
    er = max(0, min(255, 100 + ((91881 * (50 - 128) + 32768) >> 16)))
    eg = max(0, min(255, 100 - ((46802 * (50 - 128) + 22554 * (200 - 128) + 32768) >> 16)))
    eb = max(0, min(255, 100 + ((116130 * (200 - 128) + 32768) >> 16)))
    assert (int(r), int(g), int(b)) == (er, eg, eb)


def test_gray_spark_stats_path(spark):
    """decode_jpeg_rgb_stats over a tiny frame: ok rows for valid
    payloads, ok=false for garbage, grayscale promotes Y to RGB."""
    from river_spark.operators.jpeg import decode_jpeg_rgb_stats

    img = np.full((8, 16), 90, dtype=np.uint8)
    good = encode_jpeg([img])
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"junkjunk"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_jpeg_rgb_stats(df, "doc_id", "payload").collect()}
    assert rows[2]["ok"] is False
    r1 = rows[1]
    assert r1["ok"] and (r1["width"], r1["height"]) == (16, 8)
    # constant 90 -> closed form
    n = 90 - 128
    F = (n * 8589582400 + 536870912) >> 30
    qc = (2 * F + 16) >> 5
    pix = max(0, min(255, ((134212225 * qc * 16 + 536870912) >> 30) + 128))
    assert r1["r_sum"] == r1["g_sum"] == r1["b_sum"] == r1["y_sum"] == 128 * pix


def test_420_roundtrip_matches_model():
    """4:2:0: every plane decodes to the integer model at its natural
    resolution, across restart boundaries."""
    rng = np.random.default_rng(31)
    y = rng.integers(0, 256, size=(32, 48), dtype=np.uint8)
    cb = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    cr = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    from river_spark.operators.jpeg import encode_jpeg_420, upsample_chroma_nn

    data = encode_jpeg_420(y, cb, cr, restart_interval=2)
    assert b"\xff\xd0" in data
    w, h, pl = decode_jpeg(data)
    assert (w, h) == (48, 32)
    assert pl[0].shape == (32, 48) and pl[1].shape == (16, 24)
    assert (pl[0] == _model(y, QUANT_FLAT16)).all()
    assert (pl[1] == _model(cb, QUANT_FLAT17)).all()
    assert (pl[2] == _model(cr, QUANT_FLAT17)).all()
    up = upsample_chroma_nn(pl[1], 2, 2)
    assert up.shape == (32, 48)
    assert (up[::2, ::2] == pl[1]).all() and (up[1::2, 1::2] == pl[1]).all()


def test_420_reject_paths():
    from river_spark.operators.jpeg import encode_jpeg_420

    y = np.zeros((16, 16), dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_jpeg_420(np.zeros((8, 16), dtype=np.uint8),
                        np.zeros((4, 8), dtype=np.uint8),
                        np.zeros((4, 8), dtype=np.uint8))  # not 16-multiple
    with pytest.raises(ValueError):
        encode_jpeg_420(y, np.zeros((16, 16), dtype=np.uint8),
                        np.zeros((8, 8), dtype=np.uint8))  # full-res chroma
    # 4:1:1 (4,1) sampling stays outside the subset (4:2:2 became
    # VALID with the round-14 widening): craft by patching SOF
    data = bytearray(encode_jpeg_420(y, np.zeros((8, 8), dtype=np.uint8),
                                     np.zeros((8, 8), dtype=np.uint8)))
    sof = bytes(data).find(b"\xff\xc0")
    assert data[sof + 7 + 4] == 0x22  # Y sampling byte
    data[sof + 7 + 4] = 0x41
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


# ---------------------------------------------------------------------------
# round-13: progressive (SOF2)
# ---------------------------------------------------------------------------


def test_progressive_equals_baseline_decode():
    """Progressive mode re-orders the same quantized coefficients, so
    decode(progressive) == decode(baseline) EXACTLY — random planes
    exercise DC refinement, AC first-scan runs, ZRL, and AC refinement
    correction bits."""
    from river_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(13)
    for h, w, nc in [(16, 24, 3), (8, 8, 1), (32, 16, 3), (24, 24, 1)]:
        planes = [rng.integers(0, 256, size=(h, w), dtype=np.uint8)
                  for _ in range(nc)]
        wb, hb, pb = decode_jpeg(encode_jpeg(planes))
        wp, hp, pp = decode_jpeg(encode_jpeg_progressive(planes))
        assert (wb, hb) == (wp, hp)
        for a, b in zip(pb, pp):
            np.testing.assert_array_equal(a, b)


def test_progressive_smooth_and_constant():
    from river_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    i = np.arange(32)[:, None] + np.arange(32)[None, :]
    smooth = [(i * 3 % 256).astype(np.uint8)] * 3
    p = np.arange(6, dtype=np.int64)
    const = [
        np.kron(((11 * p + c) % 256).astype(np.uint8).reshape(2, 3),
                np.ones((8, 8), dtype=np.uint8))
        for c in (0, 1, 2)
    ]
    for planes in (smooth, const):
        a = decode_jpeg(encode_jpeg(planes))
        b = decode_jpeg(encode_jpeg_progressive(planes))
        for x, y in zip(a[2], b[2]):
            np.testing.assert_array_equal(x, y)


def test_progressive_eobn_runs_decode():
    """The encoder flushes every end-of-band as a plain EOB (Annex K
    tables carry no EOBn>0 symbols), but FOREIGN progressive files use
    long EOB runs — drive the scan decoders directly with a hand-built
    bitstream containing EOB2 (run of 4 blocks) in both the first-scan
    and refinement grammars."""
    from river_spark.operators.jpeg import (
        _ac_first_block,
        _ac_refine_block,
        _BitReader,
        _BitWriter,
        _canonical_codes,
        _decode_map,
        _magnitude,
    )

    # tiny custom AC table: EOB0, EOB2 (0x20), ZRL, (0,1), (1,2)
    bits = [0, 0, 5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    vals = [0x00, 0x20, 0xF0, 0x01, 0x12]
    enc = _canonical_codes(bits, vals)
    dec = _decode_map(bits, vals)

    # first scan at Al=0, band 1..63: block0 has zz[2] = -3 then EOB2
    # covering blocks 1+2 and part of the run; blocks 3,4 via EOB0s
    wtr = _BitWriter()
    c, l = enc[0x12]; wtr.write(c, l)          # run=1, size=2
    size, raw = _magnitude(-3); wtr.write(raw, size)
    c, l = enc[0x20]; wtr.write(c, l)          # EOB2: eobrun = 3 + bits
    wtr.write(0b01, 2)                          # eobrun = 3 + 1 = 4
    wtr.flush()
    data = bytes(wtr.out) + b"\xff\xd9"
    rdr = _BitReader(data, 0)
    blocks = [np.zeros(64, dtype=np.int64) for _ in range(6)]
    eobrun = 0
    for b in range(5):
        eobrun = _ac_first_block(rdr, dec, blocks[b], 1, 63, 0, eobrun)
    assert blocks[0][2] == -3
    assert eobrun == 0                          # 4-block run fully consumed
    assert all(not blocks[b].any() for b in range(1, 5))

    # refinement at Al=0 over blocks with history: EOB2 (covers 4 blocks
    # INCLUDING the current one) must still read correction bits for
    # every nonzero-history coefficient in each covered block
    wtr = _BitWriter()
    c, l = enc[0x20]; wtr.write(c, l)
    wtr.write(0b00, 2)                          # eobrun = 4 + 0
    wtr.write(0b1, 1)                           # block0: correct zz[3] up
    wtr.write(0b0, 1)                           # block1: keep zz[5]
    wtr.write(0b1, 1)                           # block2: correct zz[1] up
    wtr.write(0b0, 1)                           # block3: keep zz[2]
    wtr.flush()
    data = bytes(wtr.out) + b"\xff\xd9"
    rdr = _BitReader(data, 0)
    blocks = [np.zeros(64, dtype=np.int64) for _ in range(4)]
    blocks[0][3] = 2   # history-nonzero, LSB 0 -> +1 on a 1-bit
    blocks[1][5] = -2
    blocks[2][1] = -4
    blocks[3][2] = 6
    eobrun = 0
    for b in range(4):
        eobrun = _ac_refine_block(rdr, dec, blocks[b], 1, 63, 0, eobrun)
    assert blocks[0][3] == 3
    assert blocks[1][5] == -2
    assert blocks[2][1] == -5
    assert blocks[3][2] == 6
    assert eobrun == 0


def test_progressive_reject_paths():
    from river_spark.operators.jpeg import decode_jpeg, encode_jpeg_progressive

    planes = [np.full((8, 8), 100, dtype=np.uint8)] * 3
    data = encode_jpeg_progressive(planes)
    # truncation mid-scan (IndexError = ran off the payload, same
    # class the baseline truncation test accepts; the Spark operator
    # catches both)
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg(data[: len(data) // 2] + b"\xff\xd9")
    # 4:2:0 sampling byte inside SOF2 is outside the progressive subset
    bad = bytearray(data)
    sof = bad.find(b"\xff\xc2")
    bad[sof + 9] = 0x22  # component 1 sampling 2x2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))


# ---------------------------------------------------------------------------
# round-14: 4:2:2 (horizontal-only chroma subsampling)
# ---------------------------------------------------------------------------


def test_422_constant_block_decode_matches_closed_form():
    from river_spark.operators.jpeg import (
        encode_jpeg_422, upsample_chroma_nn, ycbcr_to_rgb_int)

    d, wm, hm = 11, 3, 2
    y = np.zeros((8 * hm, 16 * wm), dtype=np.uint8)
    cb = np.zeros((8 * hm, 8 * wm), dtype=np.uint8)
    cr = np.zeros((8 * hm, 8 * wm), dtype=np.uint8)
    for p in range(wm * hm):
        my, mx = divmod(p, wm)
        for s in range(2):
            y[my * 8:(my + 1) * 8, mx * 16 + s * 8:mx * 16 + (s + 1) * 8] = \
                (d * 29 + 5 * (2 * p + s)) % 256
        cb[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = (d * 19 + 3 * p) % 256
        cr[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = (d * 37 + 7 * p) % 256
    w, h, planes = decode_jpeg(encode_jpeg_422(y, cb, cr, restart_interval=2))
    assert (w, h) == (16 * wm, 8 * hm)
    yp, cbp, crp = planes
    assert cbp.shape == (8 * hm, 8 * wm)  # natural (half-horizontal) res
    # every decoded block is constant (DC-only closed form carries)
    for p in range(wm * hm):
        my, mx = divmod(p, wm)
        blk = cbp[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8]
        assert (blk == blk[0, 0]).all()
    # horizontal-only upsampling pairs each luma block with its MCU chroma
    cbu = upsample_chroma_nn(cbp, 2, 1)
    assert cbu.shape == yp.shape
    r, g, b = ycbcr_to_rgb_int(yp, cbu, upsample_chroma_nn(crp, 2, 1))
    assert r.shape == (8 * hm, 16 * wm)


def test_422_natural_image_roundtrip_and_stats(spark):
    from river_spark.operators.jpeg import decode_jpeg_rgb_stats, encode_jpeg_422

    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, (16, 32)).astype(np.uint8)
    cb = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    cr = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    payload = encode_jpeg_422(y, cb, cr)
    w, h, planes = decode_jpeg(payload)
    assert (w, h) == (32, 16) and planes[1].shape == (16, 16)
    df = spark.createDataFrame([(1, bytearray(payload))],
                               "doc_id long, payload binary")
    rows = decode_jpeg_rgb_stats(df, "doc_id", "payload").collect()
    assert rows[0]["ok"] is True
    assert rows[0]["width"] == 32 and rows[0]["height"] == 16


def test_422_reject_paths():
    from river_spark.operators.jpeg import encode_jpeg_422

    with pytest.raises(ValueError, match="whole 8s"):
        encode_jpeg_422(np.zeros((12, 16), dtype=np.uint8),
                        np.zeros((12, 8), dtype=np.uint8),
                        np.zeros((12, 8), dtype=np.uint8))
    with pytest.raises(ValueError, match="half horizontal"):
        encode_jpeg_422(np.zeros((8, 16), dtype=np.uint8),
                        np.zeros((8, 16), dtype=np.uint8),
                        np.zeros((8, 8), dtype=np.uint8))


def test_dqt_16bit_tables():
    """Pq=1 DQT (B.2.4.1): 16-bit big-endian entries, 129-byte table
    stride. The encoder auto-emits Pq=1 when a value exceeds 255; with
    constant 8x8 blocks only the DC step matters, so a 16-bit table
    whose DC step matches the 8-bit one must decode IDENTICALLY — and
    a doubled DC step must not."""
    import numpy as np
    from river_spark.operators.jpeg import QUANT_FLAT16, decode_jpeg, encode_jpeg

    rng = np.random.default_rng(21)
    plane = np.kron(rng.integers(0, 256, (2, 3)).astype(np.uint8),
                    np.ones((8, 8), np.uint8))
    p8 = encode_jpeg([plane] * 3)
    q16 = np.asarray(QUANT_FLAT16, dtype=np.int64).copy()
    q16[63] = 300  # AC-only change forces the 16-bit wire
    p16 = encode_jpeg([plane] * 3, quant_luma=q16)
    assert b"\xff\xdb\x00\x43" in p8  # 8-bit: 2+1+64
    assert b"\xff\xdb\x00\x83" in p16  # 16-bit: 2+1+128
    w, h, pl8 = decode_jpeg(p8)
    w2, h2, pl16 = decode_jpeg(p16)
    assert (w, h) == (w2, h2) == (24, 16)
    for a, b in zip(pl8, pl16):
        assert np.array_equal(a, b)
    # a genuinely different 16-bit DC step changes the luma plane
    qdc = np.asarray(QUANT_FLAT16, dtype=np.int64).copy()
    qdc[0], qdc[63] = 512, 300
    _, _, pldc = decode_jpeg(encode_jpeg([plane] * 3, quant_luma=qdc))
    assert not np.array_equal(pldc[0], pl8[0])


def test_dqt_reject_invalid_precision():
    import numpy as np
    import pytest
    from river_spark.operators.jpeg import decode_jpeg, encode_jpeg

    plane = np.full((8, 8), 100, np.uint8)
    payload = bytearray(encode_jpeg([plane]))
    at = payload.index(b"\xff\xdb") + 4
    payload[at] = 0x20  # Pq=2: reserved
    with pytest.raises(ValueError, match="invalid DQT precision"):
        decode_jpeg(bytes(payload))


def test_progressive_script_canonical_wire_pinned():
    """The script-parameterized encoder reproduces the pre-refactor
    canonical wire BYTE-EXACTLY (hashes captured before the refactor),
    so every standing fixture and the gated query wire are unchanged."""
    import hashlib

    import numpy as np
    from river_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(77)
    want = {1: "b2708f74a0a1f1e9cd788d08e7ab0887",
            3: "ac1bdc95c0242b073720a28eead7dad4"}
    for nc, ref in want.items():
        planes = [rng.integers(0, 256, (24, 16)).astype(np.uint8)
                  for _ in range(nc)]
        assert hashlib.md5(encode_jpeg_progressive(planes)).hexdigest() == ref


def _assert_script_equals_baseline(planes, script, tag):
    import numpy as np
    from river_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive_script)

    base = decode_jpeg(encode_jpeg(planes))
    prog = decode_jpeg(encode_jpeg_progressive_script(planes, script))
    assert (base[0], base[1]) == (prog[0], prog[1])
    for a, b in zip(base[2], prog[2]):
        assert np.array_equal(a, b), tag


def test_progressive_noncanonical_scripts_decode_equal_baseline():
    """Non-canonical scan scripts — pure spectral selection, deep Al
    ladders over split bands, mozjpeg-ish luma/chroma interleavings,
    grayscale band splits — all decode EXACTLY like the baseline wire
    of the same planes: the decoder's scan generality is pinned, not
    assumed."""
    import numpy as np

    rng = np.random.default_rng(9)
    planes3 = [rng.integers(0, 256, (24, 32)).astype(np.uint8)
               for _ in range(3)]
    allc = [0, 1, 2]
    _assert_script_equals_baseline(
        planes3,
        [(allc, 0, 0, 0, 0), ([0], 1, 5, 0, 0), ([0], 6, 63, 0, 0),
         ([1], 1, 63, 0, 0), ([2], 1, 63, 0, 0)],
        "spectral-only")
    deep = [(allc, 0, 0, 0, 2), (allc, 0, 0, 2, 1), (allc, 0, 0, 1, 0)]
    for ci in allc:
        deep += [([ci], 1, 20, 0, 2), ([ci], 21, 63, 0, 2)]
    for ci in allc:
        deep += [([ci], 1, 20, 2, 1), ([ci], 21, 63, 2, 1),
                 ([ci], 1, 20, 1, 0), ([ci], 21, 63, 1, 0)]
    _assert_script_equals_baseline(planes3, deep, "deep-ladder")
    _assert_script_equals_baseline(
        planes3,
        [(allc, 0, 0, 0, 1), ([0], 1, 8, 0, 2), ([1], 1, 63, 0, 1),
         ([2], 1, 63, 0, 1), ([0], 9, 63, 0, 2), ([0], 1, 63, 2, 1),
         (allc, 0, 0, 1, 0), ([0], 1, 63, 1, 0), ([1], 1, 63, 1, 0),
         ([2], 1, 63, 1, 0)],
        "mozjpeg-ish")
    g = [rng.integers(0, 256, (16, 16)).astype(np.uint8)]
    _assert_script_equals_baseline(
        g,
        [([0], 0, 0, 0, 0), ([0], 1, 2, 0, 1), ([0], 3, 63, 0, 1),
         ([0], 1, 2, 1, 0), ([0], 3, 63, 1, 0)],
        "grayscale-split")


def test_progressive_randomized_scripts_decode_equal_baseline():
    """Property check: randomized legal scripts (random band cuts,
    random per-position Al start up to 3) always decode equal to
    baseline."""
    import numpy as np

    rng = np.random.default_rng(123)
    for trial in range(6):
        nc = 3 if trial % 2 else 1
        planes = [rng.integers(0, 256, (16, 24)).astype(np.uint8)
                  for _ in range(nc)]
        allc = list(range(nc))
        dc_al = int(rng.integers(0, 3))
        script = [(allc, 0, 0, 0, dc_al)]
        for a in range(dc_al, 0, -1):
            script.append((allc, 0, 0, a, a - 1))
        for ci in allc:
            cuts = sorted(set([1, 63]) | set(
                int(x) for x in rng.integers(2, 63, rng.integers(0, 3))))
            bands = [(cuts[i], cuts[i + 1] - 1) for i in range(len(cuts) - 1)]
            bands[-1] = (bands[-1][0], 63)
            ac_al = int(rng.integers(0, 3))
            for ss, se in bands:
                script.append(([ci], ss, se, 0, ac_al))
            for a in range(ac_al, 0, -1):
                for ss, se in bands:
                    script.append(([ci], ss, se, a, a - 1))
        _assert_script_equals_baseline(planes, script, f"trial{trial}")


def test_progressive_script_validation_rejects_illegal():
    import numpy as np
    import pytest
    from river_spark.operators.jpeg import encode_jpeg_progressive_script

    rng = np.random.default_rng(5)
    planes = [rng.integers(0, 256, (8, 8)).astype(np.uint8) for _ in range(3)]
    allc = [0, 1, 2]
    cases = [
        ([(allc, 0, 0, 0, 1)], "incomplete"),
        ([(allc, 0, 0, 0, 0), ([0], 1, 63, 0, 0), ([0], 1, 63, 0, 0)],
         "sent twice"),
        ([([0], 1, 63, 0, 0)], "before the component's DC"),
        ([(allc, 0, 0, 0, 2), (allc, 0, 0, 2, 0)], "step Al down by 1"),
        ([(allc, 0, 0, 0, 0), ([0, 1], 1, 63, 0, 0)], "non-interleaved"),
        ([(allc, 0, 5, 0, 0)], "Se=0"),
    ]
    for script, msg in cases:
        with pytest.raises(ValueError, match=msg):
            encode_jpeg_progressive_script(planes, script)


def test_progressive_subsampled_equals_baseline():
    """Progressive 4:2:0 / 4:2:2 (round 15) — the dominant real-world
    progressive-photo layouts: interleaved DC scans walk MCUs with
    hs*vs luma blocks each, AC scans walk each component's own grid,
    chroma planes come back at natural resolution. Decode must equal
    the BASELINE subsampled decode of the same planes exactly, under
    the canonical script, a spectral-only script, and per-component
    (non-interleaved, raster-order) DC scans."""
    import numpy as np
    from river_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg_420, encode_jpeg_422,
        encode_jpeg_progressive_script)

    rng = np.random.default_rng(15)
    allc = [0, 1, 2]
    canonical = ([(allc, 0, 0, 0, 1)]
                 + [([ci], 1, 63, 0, 1) for ci in allc]
                 + [(allc, 0, 0, 1, 0)]
                 + [([ci], 1, 63, 1, 0) for ci in allc])
    spectral = [(allc, 0, 0, 0, 0), ([0], 1, 5, 0, 0), ([0], 6, 63, 0, 0),
                ([1], 1, 63, 0, 0), ([2], 1, 63, 0, 0)]
    percomp_dc = [([0], 0, 0, 0, 0), ([1], 0, 0, 0, 0), ([2], 0, 0, 0, 0),
                  ([0], 1, 63, 0, 0), ([1], 1, 63, 0, 0),
                  ([2], 1, 63, 0, 0)]

    y = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    cb = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    cr = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    base420 = decode_jpeg(encode_jpeg_420(y, cb, cr))
    for script in (canonical, spectral, percomp_dc):
        prog = decode_jpeg(encode_jpeg_progressive_script(
            [y, cb, cr], script, samps=[(2, 2), (1, 1), (1, 1)]))
        assert (base420[0], base420[1]) == (prog[0], prog[1])
        for a, b in zip(base420[2], prog[2]):
            assert a.shape == b.shape and np.array_equal(a, b)

    y2 = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    cb2 = rng.integers(0, 256, (24, 16)).astype(np.uint8)
    cr2 = rng.integers(0, 256, (24, 16)).astype(np.uint8)
    base422 = decode_jpeg(encode_jpeg_422(y2, cb2, cr2))
    prog = decode_jpeg(encode_jpeg_progressive_script(
        [y2, cb2, cr2], canonical, samps=[(2, 1), (1, 1), (1, 1)]))
    for a, b in zip(base422[2], prog[2]):
        assert a.shape == b.shape and np.array_equal(a, b)


def test_progressive_subsampled_rejects():
    import numpy as np
    import pytest
    from river_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg_progressive_script)

    rng = np.random.default_rng(16)
    y = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    cb = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    cr = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    with pytest.raises(ValueError, match="plane shape inconsistent"):
        encode_jpeg_progressive_script(
            [y, y, y], None, samps=[(2, 2), (1, 1), (1, 1)])
    # a 4:1:1 SOF2 byte must be rejected by the decoder
    payload = bytearray(encode_jpeg_progressive_script(
        [y, cb, cr], None, samps=[(2, 2), (1, 1), (1, 1)]))
    at = payload.index(b"\xff\xc2") + 4  # start of the SOF2 body
    comp0 = at + 6  # prec(1) + h(2) + w(2) + nc(1)
    payload[comp0 + 1] = 0x41  # sampling byte of component 0 -> (4,1)
    with pytest.raises(ValueError, match="sampling"):
        decode_jpeg(bytes(payload))
