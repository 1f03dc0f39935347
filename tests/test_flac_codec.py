"""FLAC (fixed-predictor subset) codec tests (operators/flac.py).
The driver-gated query pins the lossless closed form end-to-end; these
pin the pieces: CRC polynomials against known vectors, Rice/unary
round trips, every subframe type, predictor orders, the escape path,
multi-frame sequencing, and the reject paths."""

from __future__ import annotations

import numpy as np
import pytest

from river_spark.operators.flac import (
    _best_rice_k,
    _fixed_residual,
    _unzigzag,
    _zigzag,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


def test_crc_known_vectors():
    # CRC-8 poly 0x07, init 0: standard check value for "123456789"
    assert crc8(b"123456789") == 0xF4
    # CRC-16/BUYPASS (poly 0x8005, init 0, no reflect): check 0xFEE8
    assert crc16(b"123456789") == 0xFEE8
    assert crc8(b"") == 0 and crc16(b"") == 0


def test_zigzag_roundtrip():
    for v in [0, 1, -1, 2, -2, 100, -100, 32767, -32768, 12345, -12345]:
        u = int(_zigzag(np.array([v]))[0])
        assert u >= 0
        assert _unzigzag(u) == v


def test_fixed_residual_orders():
    x = np.array([3, 7, 13, 21, 31], dtype=np.int64)  # quadratic
    assert list(_fixed_residual(x, 0)) == [3, 7, 13, 21, 31]
    assert list(_fixed_residual(x, 1)) == [4, 6, 8, 10]
    assert list(_fixed_residual(x, 2)) == [2, 2, 2]  # constant 2nd diff
    assert list(_fixed_residual(x, 3)) == [0, 0]


def test_best_rice_k_scales():
    assert _best_rice_k(np.array([0, 1, 2, 3])) <= 2
    assert _best_rice_k(np.array([10_000] * 8)) >= 10


@pytest.mark.parametrize(
    "signal",
    [
        np.full(300, 77, dtype=np.int16),                           # constant
        np.arange(300, dtype=np.int16) * 5 - 700,                   # linear
        (np.arange(300) ** 2 % 20000 - 10000).astype(np.int16),     # quadratic-wrap
        np.random.default_rng(1).integers(-32768, 32768, 300).astype(np.int16),
        np.array([5, -5], dtype=np.int16),                          # minimal block
    ],
    ids=["constant", "linear", "quadratic", "noise", "tiny"],
)
def test_lossless_roundtrip(signal):
    rate, out = decode_flac(encode_flac(44100, signal, block_size=128))
    assert rate == 44100
    assert (out == signal).all()


def test_multi_frame_and_partial_last_block():
    x = (np.arange(1000) * 7 % 5000 - 2500).astype(np.int16)
    _, out = decode_flac(encode_flac(8000, x, block_size=256))  # 4 frames, last 232
    assert (out == x).all()


def test_escape_path_roundtrip():
    x = (np.arange(500) * 11 % 3000 - 1500).astype(np.int16)
    data = encode_flac(8000, x, force_escape=True)
    _, out = decode_flac(data)
    assert (out == x).all()
    # escape must genuinely differ from the rice stream
    assert data != encode_flac(8000, x)


def test_compression_on_smooth_signal():
    t = np.arange(4000)
    x = (3000 * np.sin(2 * np.pi * t / 200)).astype(np.int16)
    enc = encode_flac(22050, x)
    assert len(enc) < 0.55 * 2 * len(x), len(enc) / (2 * len(x))


def test_crc_detects_corruption():
    x = (np.arange(300) * 3 - 400).astype(np.int16)
    data = bytearray(encode_flac(8000, x))
    # flip a bit in the last frame body (past metadata)
    data[-5] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(data))


def test_reject_paths():
    x = np.zeros(10, dtype=np.int16)
    data = encode_flac(8000, x)
    with pytest.raises(ValueError):
        decode_flac(b"OggS" + data[4:])
    with pytest.raises(ValueError):
        decode_flac(data[:20])
    with pytest.raises(ValueError):
        encode_flac(8000, np.array([], dtype=np.int16))
    with pytest.raises(ValueError):
        encode_flac(8000, np.array([40000], dtype=np.int64))  # >16 bit
    # truncated mid-stream
    with pytest.raises(ValueError):
        decode_flac(data[: len(data) - 3])


def test_spark_stats_path(spark):
    from river_spark.operators.flac import decode_flac_stats

    x = (np.arange(300, dtype=np.int64) % 100 - 50).astype(np.int16)
    good = encode_flac(16000, x)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"fLaCxxxx"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_flac_stats(df, "doc_id", "payload").collect()}
    assert rows[2]["ok"] is False
    r1 = rows[1]
    s = x.astype(np.int64)
    p = np.arange(s.size, dtype=np.int64)
    assert r1["ok"] and r1["sample_rate"] == 16000
    assert r1["sample_sum"] == int(s.sum())
    assert r1["abs_sum"] == int(np.abs(s).sum())
    assert r1["pos_weighted_sum"] == int(((p % 997 + 1) * s).sum())


# ---------------------------------------------------------------------------
# round-13 subset widening: LPC subframes + stereo decorrelation
# ---------------------------------------------------------------------------


def _stereo_signal(n=700, seed_d=5):
    i = np.arange(n, dtype=np.int64)
    left = ((seed_d * 17 + 5 * i) % 3001) - 1500 + (i % 13) * 2
    right = left - (((seed_d + i) % 257) - 128)
    return np.stack([left, right], axis=1).astype(np.int16)


def test_lpc_mono_lossless_roundtrip():
    i = np.arange(900, dtype=np.int64)
    x = (((7 * i) % 4001) - 2000 + (i % 17) * 3).astype(np.int16)
    data = encode_flac(8000, x, lpc_orders=(2, 4, 8))
    rate, got = decode_flac(data)
    assert rate == 8000
    np.testing.assert_array_equal(got, x)


def test_force_lpc_puts_lpc_on_the_wire():
    """With force_lpc the stream must contain NO fixed-predictor
    subframes — decode through a patched _FIXED_COEFFS would fail, so
    instead re-encode without LPC and check the bytes differ AND the
    LPC stream still round-trips."""
    i = np.arange(512, dtype=np.int64)
    x = (((11 * i) % 3001) - 1500).astype(np.int16)
    lpc = encode_flac(8000, x, lpc_orders=(4,), force_lpc=True)
    fixed = encode_flac(8000, x)
    assert lpc != fixed
    # LPC subframe header bit 0b100000 present in the stream: decode
    # exercises the LPC reconstruction (would ValueError on reserved)
    rate, got = decode_flac(lpc)
    np.testing.assert_array_equal(got, x)


def test_lpc_plus_escape_roundtrip():
    i = np.arange(300, dtype=np.int64)
    x = (((13 * i) % 2001) - 1000).astype(np.int16)
    data = encode_flac(8000, x, lpc_orders=(2, 4), force_lpc=True,
                       force_escape=True)
    rate, got = decode_flac(data)
    np.testing.assert_array_equal(got, x)


@pytest.mark.parametrize("mode", ["auto", "cycle"])
def test_stereo_lossless_roundtrip(mode):
    s = _stereo_signal()
    data = encode_flac(44100, s, block_size=128, lpc_orders=(2, 4, 8),
                       channel_mode=mode)
    rate, got = decode_flac(data)
    assert rate == 44100 and got.shape == s.shape
    np.testing.assert_array_equal(got, s)


def test_cycle_mode_covers_all_four_assignments():
    """>= 4 frames at block 128: the frame headers must carry all four
    channel codes (0b0001 independent, 0b1000/0b1001 sides, 0b1010
    mid/side)."""
    s = _stereo_signal(n=600)
    data = encode_flac(44100, s, block_size=128, channel_mode="cycle")
    codes = set()
    # walk frames by sync pattern: 0xFF 0xF8 (this subset's first two
    # header bytes), channel code is the high nibble of byte 3
    pos = 0
    while True:
        pos = data.find(b"\xff\xf8", pos)
        if pos < 0:
            break
        codes.add(data[pos + 3] >> 4)
        pos += 2
    assert {0b0001, 0b1000, 0b1001, 0b1010} <= codes


def test_stereo_independent_channels_extreme_values():
    # anticorrelated full-range channels: side = L - R spans 17 bits
    n = 256
    left = np.full(n, 32767, dtype=np.int64)
    left[::2] = -32768
    right = -left - 1
    s = np.stack([left, right], axis=1).astype(np.int16)
    for mode in ("auto", "cycle"):
        data = encode_flac(8000, s, channel_mode=mode)
        rate, got = decode_flac(data)
        np.testing.assert_array_equal(got, s)


def test_stereo_constant_and_short_blocks():
    s = np.zeros((5, 2), dtype=np.int16)
    s[:, 0] = 7
    s[:, 1] = -3
    data = encode_flac(8000, s, block_size=4)
    rate, got = decode_flac(data)
    np.testing.assert_array_equal(got, s)


def test_lpc_reject_paths():
    with pytest.raises(ValueError):
        encode_flac(8000, np.zeros((4, 9), dtype=np.int16))  # 9 channels
        # (3-8 channels became VALID with the round-14 widening)
    with pytest.raises(ValueError):
        encode_flac(8000, np.zeros(8, dtype=np.int16), channel_mode="best")
    # corrupt an LPC stream body: CRC-16 must catch it
    i = np.arange(400, dtype=np.int64)
    x = (((7 * i) % 1501) - 750).astype(np.int16)
    data = bytearray(encode_flac(8000, x, lpc_orders=(4,), force_lpc=True))
    data[len(data) // 2] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac(bytes(data))


def test_mono_bytes_unchanged_by_widening():
    """The round-13 widening must not move a byte of the existing mono
    fixed-predictor wire (the driver query mm_flac_decode_stats pins
    stats, this pins layout): LPC is searched only when lpc_orders is
    non-empty."""
    i = np.arange(500, dtype=np.int64)
    x = (((5 * i) % 4001) - 2000 + (i % 17) * 3).astype(np.int16)
    a = encode_flac(12000, x)
    b = encode_flac(12000, x, lpc_orders=())
    assert a == b


def test_spark_stereo_stats_path(spark):
    from river_spark.operators.flac import decode_flac_stereo_stats

    s = _stereo_signal(n=500)
    good = encode_flac(24000, s, block_size=128, lpc_orders=(2, 4, 8),
                       force_lpc=True, channel_mode="cycle")
    mono = encode_flac(24000, s[:, 0].copy())
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(mono)), (3, bytearray(b"fLaCxx"))],
        "doc_id long, payload binary",
    )
    rows = {
        r["doc_id"]: r
        for r in decode_flac_stereo_stats(df, "doc_id", "payload").collect()
    }
    assert rows[2]["ok"] is False  # mono stream rejected by the stereo op
    assert rows[3]["ok"] is False
    r1 = rows[1]
    s64 = s.astype(np.int64)
    w = np.arange(s64.shape[0], dtype=np.int64) % 997 + 1
    assert r1["ok"] and r1["sample_rate"] == 24000
    assert r1["n_samples"] == 500
    assert r1["left_sum"] == int(s64[:, 0].sum())
    assert r1["right_sum"] == int(s64[:, 1].sum())
    assert r1["left_abs_sum"] == int(np.abs(s64[:, 0]).sum())
    assert r1["right_abs_sum"] == int(np.abs(s64[:, 1]).sum())
    assert r1["left_pw_sum"] == int((w * s64[:, 0]).sum())
    assert r1["right_pw_sum"] == int((w * s64[:, 1]).sum())


# ---------------------------------------------------------------------------
# Round 14: Rice partition orders > 0 and wasted bits — the residual
# layout real encoders emit by default.
# ---------------------------------------------------------------------------

def _transient_signal(n=768, d=3):
    """Quiet runs punctuated by loud spikes every 64 samples — the
    waveform shape partitioned Rice exists for (one k per block is a
    compromise; per-partition k prices the loud and quiet runs apart)."""
    i = np.arange(n, dtype=np.int64)
    quiet = ((d * 13 + 3 * i) % 31) - 15
    spike = np.where(i % 64 < 4, ((d * 7 + 11 * i) % 2048) - 1024, 0)
    return (quiet + spike).astype(np.int16)


@pytest.mark.parametrize("orders", [(1,), (2,), (4,), (0, 1, 2, 3, 4)])
def test_partitioned_rice_lossless_roundtrip(orders):
    x = _transient_signal()
    data = encode_flac(16000, x, block_size=256, partition_orders=orders)
    rate, out = decode_flac(data)
    assert rate == 16000 and (out == x).all()
    # a sole order > 0 must genuinely change the wire vs order 0
    if orders != (0, 1, 2, 3, 4):
        assert data != encode_flac(16000, x, block_size=256)


def test_partitioning_compresses_transients():
    """The feature's reason to exist, pinned: a transient-heavy block
    compresses measurably better partitioned (per-partition k) than
    with one compromise Rice parameter."""
    x = _transient_signal(n=1024)
    flat = encode_flac(16000, x, block_size=256, partition_orders=(0,))
    part = encode_flac(16000, x, block_size=256,
                       partition_orders=(0, 1, 2, 3, 4))
    assert len(part) < 0.96 * len(flat), (len(part), len(flat))


def test_partitioned_escape_and_lpc_roundtrip():
    x = _transient_signal(n=512)
    for kw in (dict(force_escape=True), dict(lpc_orders=(2, 4, 8), force_lpc=True)):
        data = encode_flac(8000, x, block_size=256,
                           partition_orders=(2,), **kw)
        _, out = decode_flac(data)
        assert (out == x).all()


def test_partition_search_skips_invalid_orders():
    # last frame of 300 samples at block 256 leaves a 44-sample block:
    # 44 is not divisible by 8, so order 3 must fall back, not crash
    x = _transient_signal(n=300)
    data = encode_flac(8000, x, block_size=256, partition_orders=(3,))
    _, out = decode_flac(data)
    assert (out == x).all()


def test_wasted_bits_lossless_and_smaller():
    x = (_transient_signal(n=768).astype(np.int64) * 4).astype(np.int16)
    plain = encode_flac(16000, x, block_size=256)
    wasted = encode_flac(16000, x, block_size=256, detect_wasted=True)
    assert wasted != plain
    assert len(wasted) < len(plain)
    for data in (plain, wasted):
        rate, out = decode_flac(data)
        assert rate == 16000 and (out == x).all()


def test_wasted_bits_stereo_and_lpc_roundtrip():
    s = _stereo_signal(n=512)
    s8 = (s.astype(np.int64) // 4 * 8).astype(np.int16)  # 3 trailing zeros
    data = encode_flac(24000, s8, block_size=128, lpc_orders=(2, 4),
                       channel_mode="cycle", detect_wasted=True,
                       partition_orders=(0, 1, 2))
    _, out = decode_flac(data)
    assert (out == s8).all()


def test_wasted_bits_no_false_positive():
    # one odd sample anywhere means zero wasted bits: wire must match
    x = _transient_signal(n=256) * 4
    x[100] += 1
    a = encode_flac(8000, x.astype(np.int16), detect_wasted=True)
    b = encode_flac(8000, x.astype(np.int16), detect_wasted=False)
    assert a == b


def test_partition_and_wasted_decode_reject_paths():
    from river_spark.operators.flac import _BitReader, _BitWriter, _decode_subframe

    def sub_bits(build):
        w = _BitWriter()
        build(w)
        w.align()
        return _BitReader(bytes(w.out))

    # partition count does not divide the block size (n=10, po=2)
    r = sub_bits(lambda w: [w.write(0, 1), w.write(0b001001, 6), w.write(0, 1),
                            w.write(5, 16),          # warmup (order 1)
                            w.write(0, 2), w.write(2, 4)])
    with pytest.raises(ValueError, match="divide"):
        _decode_subframe(r, 10, 16)

    # first partition starved: n=8, po=2 -> 2 samples/partition, order 2
    r = sub_bits(lambda w: [w.write(0, 1), w.write(0b001010, 6), w.write(0, 1),
                            w.write(1, 16), w.write(2, 16),
                            w.write(0, 2), w.write(2, 4)])
    with pytest.raises(ValueError, match="starves"):
        _decode_subframe(r, 8, 16)

    # wasted bits >= sample width (flag + unary 15 -> w=16 at bps=16)
    r = sub_bits(lambda w: [w.write(0, 1), w.write(0b001000, 6), w.write(1, 1),
                            w.unary(15)])
    with pytest.raises(ValueError, match="exceed"):
        _decode_subframe(r, 4, 16)


def test_round14_defaults_leave_wire_unchanged():
    """partition_orders=(0,) + detect_wasted=False is the pre-round-14
    wire byte-for-byte (the driver queries mm_flac_decode_stats /
    mm_flac_lpc_decode_stats pin stats; this pins layout)."""
    x = _transient_signal(n=500)
    assert encode_flac(8000, x) == encode_flac(
        8000, x, partition_orders=(0,), detect_wasted=False)


# ---------------------------------------------------------------------------
# Round 14 (second widening): bit depths 8/24 and 3-8 channel layouts.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bd,dtype", [(8, np.int8), (16, np.int16),
                                      (24, np.int32)])
def test_bit_depth_roundtrip_mono(bd, dtype):
    i = np.arange(700, dtype=np.int64)
    lim = 1 << (bd - 1)
    x = ((13 * i + 7) % (2 * lim)) - lim
    data = encode_flac(48000, x, bit_depth=bd, lpc_orders=(2, 4),
                       partition_orders=(0, 1, 2), detect_wasted=True)
    rate, out = decode_flac(data)
    assert rate == 48000 and out.dtype == dtype
    assert np.array_equal(out.astype(np.int64), x)


def test_24bit_stereo_all_modes_roundtrip():
    i = np.arange(512, dtype=np.int64)
    left = ((11 * i) % 15000001) - 7500000
    right = left - ((i % 50001) - 25000)
    st = np.stack([left, right], axis=1)
    data = encode_flac(96000, st, bit_depth=24, channel_mode="cycle",
                       block_size=128, lpc_orders=(4,))
    _, out = decode_flac(data)
    assert out.dtype == np.int32
    assert np.array_equal(out.astype(np.int64), st)


@pytest.mark.parametrize("nch", [3, 4, 6, 8])
def test_multichannel_roundtrip(nch):
    i = np.arange(600, dtype=np.int64)
    mc = np.stack([(((7 * c + 3) * i) % 4001) - 2000 for c in range(nch)],
                  axis=1)
    data = encode_flac(44100, mc, block_size=192, lpc_orders=(2,),
                       partition_orders=(0, 1, 2, 3))
    _, out = decode_flac(data)
    assert out.shape == (600, nch)
    assert np.array_equal(out.astype(np.int64), mc)
    # channel code nch-1 on every frame header's upper nibble
    # (byte 4 of each frame: after sync(2) + bscode/rate(1))
    sync_at = data.index(b"\xff\xf8", 4)
    assert data[sync_at + 3] >> 4 == nch - 1


def test_bit_depth_on_the_wire_and_mismatch_reject():
    i = np.arange(300, dtype=np.int64)
    x = ((5 * i) % 200) - 100
    d8 = bytearray(encode_flac(8000, x, bit_depth=8))
    # frame sample-size code lives in bits 1-3 of header byte 3
    sync_at = bytes(d8).index(b"\xff\xf8", 4)
    assert (d8[sync_at + 3] >> 1) & 0x7 == 0b001
    # flip STREAMINFO bps to 16 while frames still say 8: must reject
    # (packed rate/channels/bps/total field at byte 4+4+10 = 18;
    # bps-1 is bits 36-40)
    packed = int.from_bytes(d8[18:26], "big")
    packed = (packed & ~(0x1F << 36)) | (15 << 36)
    d8[18:26] = packed.to_bytes(8, "big")
    with pytest.raises(ValueError, match="disagrees"):
        decode_flac(bytes(d8))


def test_multichannel_24bit_wasted_roundtrip():
    i = np.arange(500, dtype=np.int64)
    mc = np.stack([((((19 + 7 * c + 5 * i) % 2000001) - 1000000)) * 4
                   for c in range(4)], axis=1)
    data = encode_flac(48000, mc, bit_depth=24, detect_wasted=True,
                       partition_orders=(0, 1, 2))
    _, out = decode_flac(data)
    assert np.array_equal(out.astype(np.int64), mc)


def test_bit_depth_rejects():
    x = np.arange(10, dtype=np.int64)
    with pytest.raises(ValueError, match="bit_depth"):
        encode_flac(8000, x, bit_depth=32)
    with pytest.raises(ValueError, match="range"):
        encode_flac(8000, x * 100, bit_depth=8)
    with pytest.raises(ValueError, match="range"):
        encode_flac(8000, np.array([1 << 23]), bit_depth=24)
    with pytest.raises(ValueError, match="range"):
        encode_flac(8000, np.array([1 << 11]), bit_depth=12)
    with pytest.raises(ValueError, match="range"):
        encode_flac(8000, np.array([-(1 << 19) - 1]), bit_depth=20)


# ---------------------------------------------------------------------------
# Round 15 (r14 verdict #6): 12/20-bit depths — non-byte-aligned widths
# put every warmup/verbatim sample on the bit-reader's unaligned path.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bd,code,dtype", [(12, 0b010, np.int16),
                                           (20, 0b101, np.int32)])
def test_bit_depth_12_20_roundtrip_and_wire(bd, code, dtype):
    i = np.arange(700, dtype=np.int64)
    lim = 1 << (bd - 1)
    x = ((13 * i + 7) % (2 * lim)) - lim
    data = encode_flac(48000, x, bit_depth=bd, lpc_orders=(2, 4),
                       partition_orders=(0, 1, 2), detect_wasted=True)
    rate, out = decode_flac(data)
    assert rate == 48000 and out.dtype == dtype
    assert np.array_equal(out.astype(np.int64), x)
    # sample-size code on the frame header (bits 1-3 of header byte 3)
    sync_at = data.index(b"\xff\xf8", 4)
    assert (data[sync_at + 3] >> 1) & 0x7 == code


@pytest.mark.parametrize("bd", [12, 20])
def test_bit_depth_12_20_stereo_and_multichannel(bd):
    i = np.arange(512, dtype=np.int64)
    lim = 1 << (bd - 1)
    left = ((11 * i) % (2 * lim - 100)) - (lim - 50)
    right = left - ((i % 101) - 50)   # side channel runs at bd + 1 bits
    st = np.stack([left, right], axis=1)
    _, out = decode_flac(encode_flac(96000, st, bit_depth=bd,
                                     channel_mode="cycle", block_size=128))
    assert np.array_equal(out.astype(np.int64), st)
    mc = np.stack([((7 * c + 3) * i % (2 * lim - 64)) - (lim - 32)
                   for c in range(5)], axis=1)
    _, out = decode_flac(encode_flac(44100, mc, bit_depth=bd,
                                     partition_orders=(0, 1, 2),
                                     detect_wasted=True))
    assert np.array_equal(out.astype(np.int64), mc)


def test_widening_leaves_16bit_wire_unchanged():
    i = np.arange(500, dtype=np.int64)
    x = (((5 * i) % 4001) - 2000).astype(np.int16)
    assert encode_flac(12000, x) == encode_flac(12000, x, bit_depth=16)
    st = np.stack([x, x // 2], axis=1)
    assert encode_flac(12000, st) == encode_flac(12000, st, bit_depth=16)


def test_spark_multichannel_stats_path(spark):
    from river_spark.operators.flac import decode_flac_multichannel_stats

    i = np.arange(400, dtype=np.int64)
    mc = np.stack([(((3 + c) * i) % 3001) - 1500 for c in range(5)], axis=1)
    good = encode_flac(32000, mc, block_size=128)
    stereo = encode_flac(32000, mc[:, :2].copy())
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(stereo)), (3, bytearray(b"fLaCxx"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r
            for r in decode_flac_multichannel_stats(df, "doc_id", "payload").collect()}
    assert rows[2]["ok"] is False   # stereo rejected by the multichannel op
    assert rows[3]["ok"] is False
    r1 = rows[1]
    pw = (i % 997 + 1)[:, None]
    cw = np.arange(1, 6)[None, :]
    assert r1["ok"] and r1["sample_rate"] == 32000
    assert r1["n_samples"] == 400 and r1["n_channels"] == 5
    assert r1["sample_sum"] == int(mc.sum())
    assert r1["abs_sum"] == int(np.abs(mc).sum())
    assert r1["chpos_weighted_sum"] == int((pw * cw * mc).sum())


# ---------------------------------------------------------------------------
# Round 14 (third widening): variable blocking — the last framing
# residue. Blocking-strategy bit 1, UTF-8 starting-SAMPLE numbers,
# deterministic block-size cycle.
# ---------------------------------------------------------------------------

def test_variable_blocking_roundtrip_and_wire():
    i = np.arange(1500, dtype=np.int64)
    x = (((7 * i) % 4001) - 2000 + (i % 17) * 3).astype(np.int16)
    var = encode_flac(8000, x, block_size=256, variable_blocking=True,
                      lpc_orders=(2, 4), partition_orders=(0, 1, 2),
                      detect_wasted=True)
    fix = encode_flac(8000, x, block_size=256)
    assert var != fix
    # strategy bit on the wire: sync byte pair reads FF F9 (variable)
    assert b"\xff\xf9" in var and b"\xff\xf9" not in fix
    # STREAMINFO min/max block sizes differ under the cycle
    import struct as _s
    mn, mx = _s.unpack_from(">HH", var, 8)
    assert (mn, mx) == (128, 256)
    rate, out = decode_flac(var)
    assert rate == 8000 and (out == x).all()


def test_variable_blocking_stereo_and_multichannel():
    i = np.arange(900, dtype=np.int64)
    st = np.stack([(i * 5) % 3000 - 1500, (i * 7) % 3000 - 1500],
                  axis=1).astype(np.int16)
    _, out = decode_flac(encode_flac(16000, st, block_size=128,
                                     variable_blocking=True,
                                     channel_mode="cycle"))
    assert np.array_equal(out, st)
    mc = np.stack([((5 * c + 3) * i % 16000001) - 8000000 for c in range(4)],
                  axis=1)
    _, out = decode_flac(encode_flac(48000, mc, bit_depth=24,
                                     variable_blocking=True,
                                     partition_orders=(0, 1)))
    assert np.array_equal(out.astype(np.int64), mc)


def test_variable_blocking_four_byte_sample_numbers():
    # 70000 samples: frame starting-sample numbers cross 0x10000, so
    # the 4-byte UTF-8 extension is genuinely on the wire
    x = ((np.arange(70000, dtype=np.int64) % 200) - 100).astype(np.int16)
    data = encode_flac(8000, x, block_size=256, variable_blocking=True)
    _, out = decode_flac(data)
    assert (out == x).all()


def test_variable_blocking_sample_number_mismatch_rejected():
    i = np.arange(700, dtype=np.int64)
    x = (((11 * i) % 2001) - 1000).astype(np.int16)
    data = bytearray(encode_flac(8000, x, block_size=256,
                                 variable_blocking=True))
    # find the SECOND frame header and corrupt its sample number (the
    # byte right after sync+bs/rate+ch/ss = offset 4 into the header);
    # re-stamp the header CRC-8 so only the SEQUENCING check can object
    from river_spark.operators.flac import crc8
    first = bytes(data).index(b"\xff\xf9", 4)
    second = bytes(data).index(b"\xff\xf9", first + 2)
    # header: 2 sync + 1 bs/rate + 1 ch/ss + utf8(256 -> 2 bytes) + 1 bsv
    assert data[second + 4] >> 5 == 0b110  # 2-byte UTF-8 for 256
    data[second + 4 : second + 6] = bytes([0xC0 | (300 >> 6),
                                           0x80 | (300 & 0x3F)])
    hdr_len = 7  # sync2 + bsrate1 + chss1 + utf8_2 + blocksize1
    data[second + hdr_len] = crc8(bytes(data[second : second + hdr_len]))
    with pytest.raises(ValueError, match="sequence"):
        decode_flac(bytes(data))


def test_review_fixes_round14():
    # (n,1) input is mono, not a crash or a silent shape change
    x = (np.arange(50, dtype=np.int64) % 30) - 15
    _, out = decode_flac(encode_flac(8000, x.reshape(-1, 1)))
    assert out.ndim == 1 and np.array_equal(out.astype(np.int64), x)
    # the stereo stats op must reject MULTICHANNEL streams, not read
    # channels 0/1 of a surround stream as left/right
    from river_spark.operators.flac import decode_flac_stereo_stats  # noqa: F401
    import inspect
    src = inspect.getsource(decode_flac_stereo_stats)
    assert "s.shape[1] != 2" in src


def test_stereo_stats_rejects_multichannel(spark):
    from river_spark.operators.flac import decode_flac_stereo_stats

    i = np.arange(300, dtype=np.int64)
    mc = np.stack([((3 + c) * i % 2001) - 1000 for c in range(5)], axis=1)
    payload = encode_flac(16000, mc)
    df = spark.createDataFrame([(1, bytearray(payload))],
                               "doc_id long, payload binary")
    rows = decode_flac_stereo_stats(df, "doc_id", "payload").collect()
    assert rows[0]["ok"] is False
