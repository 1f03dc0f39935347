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
