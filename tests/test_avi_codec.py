"""AVI container tests (operators/avi.py). The driver-gated query pins
the sampled-stats closed form; these pin the container mechanics: DIB
stride padding, frame order, lazy sampling, idx1 layout, and rejects."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from river_spark.operators.avi import (
    _row_stride,
    decode_avi,
    encode_avi,
    iter_avi_frames,
)


def test_stride_padding_roundtrip():
    """w=10 -> 30 bytes of pixels padded to 32 per row; the pad bytes
    must be written and skipped exactly."""
    assert _row_stride(10) == 32 and _row_stride(8) == 24
    rng = np.random.default_rng(4)
    frames = [rng.integers(0, 256, size=(5, 10, 3), dtype=np.uint8) for _ in range(3)]
    w, h, fps, out = decode_avi(encode_avi(frames, fps=25))
    assert (w, h, fps) == (10, 5, 25)
    for a, b in zip(frames, out):
        assert (a == b).all()


def test_sampling_skips_without_decoding():
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, size=(4, 8, 3), dtype=np.uint8) for _ in range(9)]
    data = encode_avi(frames)
    got = list(iter_avi_frames(data, every_k=4))
    assert [i for i, _ in got] == [0, 4, 8]
    for i, f in got:
        assert (f == frames[i]).all()


def test_single_frame_and_order():
    f0 = np.zeros((4, 4, 3), dtype=np.uint8)
    f1 = np.full((4, 4, 3), 200, dtype=np.uint8)
    _, _, _, out = decode_avi(encode_avi([f0, f1]))
    assert out[0].sum() == 0 and out[1].sum() == 200 * 48


def test_idx1_offsets_point_at_frames():
    """The index entries must land on the 00db chunks relative to the
    movi fourcc (the convention real players use)."""
    frames = [np.full((4, 4, 3), v, dtype=np.uint8) for v in (1, 2, 3)]
    data = encode_avi(frames)
    movi_tag = data.find(b"movi")
    i1 = data.find(b"idx1")
    (ilen,) = struct.unpack_from("<I", data, i1 + 4)
    n = ilen // 16
    assert n == 3
    for e in range(n):
        fourcc, flags, off, size = struct.unpack_from(
            "<4sIII", data, i1 + 8 + 16 * e
        )
        assert fourcc == b"00db" and flags == 0x10
        assert data[movi_tag + off : movi_tag + off + 4] == b"00db"
        (clen,) = struct.unpack_from("<I", data, movi_tag + off + 4)
        assert clen == size


def test_reject_paths():
    frames = [np.zeros((4, 4, 3), dtype=np.uint8)]
    data = encode_avi(frames)
    with pytest.raises(ValueError):
        decode_avi(b"RIFX" + data[4:])
    with pytest.raises(ValueError):
        decode_avi(data[:40])  # truncated
    with pytest.raises(ValueError):
        encode_avi([])
    with pytest.raises(ValueError):
        encode_avi([np.zeros((4, 4, 3), dtype=np.uint8),
                    np.zeros((5, 4, 3), dtype=np.uint8)])
    # frame-count lie in avih must be caught by the structural walk
    bad = bytearray(data)
    avih = bad.find(b"avih")
    struct.pack_into("<I", bad, avih + 8 + 16, 5)  # claim 5 frames
    with pytest.raises(ValueError):
        decode_avi(bytes(bad))


def test_spark_stats_path(spark):
    from river_spark.operators.avi import decode_avi_frame_stats

    frames = [np.full((4, 4, 3), 10 * (f + 1), dtype=np.uint8) for f in range(4)]
    good = encode_avi(frames, fps=15)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"RIFFjunk"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in
            decode_avi_frame_stats(df, "doc_id", "payload", every_k=2).collect()}
    assert rows[2]["ok"] is False
    r1 = rows[1]
    # sampled frames 0 and 2: constants 10 and 30, 16 px each
    assert r1["ok"] and r1["n_sampled"] == 2 and r1["fps"] == 15
    assert r1["r_sum"] == 16 * (10 + 30)
    assert r1["frame_weighted_r"] == 1 * 16 * 10 + 3 * 16 * 30


# ---------------------------------------------------------------------------
# round-13: MJPEG frames ('MJPG' biCompression, JPEG chunk payloads)
# ---------------------------------------------------------------------------


def _const_block_jpeg(d, f, wb, hb):
    from river_spark.operators.jpeg import encode_jpeg

    p = np.arange(wb * hb, dtype=np.int64)
    planes = [
        np.kron(
            (((d * a + b * f + c * p) % 256).astype(np.uint8).reshape(hb, wb)),
            np.ones((8, 8), dtype=np.uint8),
        )
        for a, b, c in ((31, 11, 5), (17, 13, 3), (23, 19, 7))
    ]
    return encode_jpeg(planes, restart_interval=2)


def test_mjpeg_container_roundtrip():
    from river_spark.operators.avi import encode_avi_mjpeg, iter_avi_mjpeg_frames
    from river_spark.operators.jpeg import decode_jpeg

    wb, hb = 3, 2
    frames = [_const_block_jpeg(7, f, wb, hb) for f in range(5)]
    data = encode_avi_mjpeg(frames, 8 * wb, 8 * hb, fps=12)
    got = list(iter_avi_mjpeg_frames(data))
    assert [fi for fi, _ in got] == [0, 1, 2, 3, 4]
    # chunk payloads are the exact JPEG bytes in order
    assert [jf for _, jf in got] == frames
    w, h, planes = decode_jpeg(got[3][1])
    assert (w, h) == (8 * wb, 8 * hb)


def test_mjpeg_sampling_skips_decoder():
    from river_spark.operators.avi import encode_avi_mjpeg, iter_avi_mjpeg_frames

    frames = [_const_block_jpeg(3, f, 2, 2) for f in range(6)]
    # corrupt frame 1's entropy data: sampling every 2nd frame must
    # never touch it (the skipped chunk is not parsed at all)
    bad = bytearray(frames[1])
    bad[-10] ^= 0x55
    frames[1] = bytes(bad)
    data = encode_avi_mjpeg(frames, 16, 16, fps=10)
    got = [fi for fi, _ in iter_avi_mjpeg_frames(data, every_k=2)]
    assert got == [0, 2, 4]


def test_mjpeg_reject_paths():
    from river_spark.operators.avi import (
        encode_avi_mjpeg,
        iter_avi_frames,
        iter_avi_mjpeg_frames,
        encode_avi,
    )

    frames = [_const_block_jpeg(1, f, 2, 2) for f in range(3)]
    data = encode_avi_mjpeg(frames, 16, 16)
    # DIB iterator refuses MJPEG and vice versa
    with pytest.raises(ValueError):
        list(iter_avi_frames(data))
    dib = encode_avi([np.zeros((8, 8, 3), dtype=np.uint8)])
    with pytest.raises(ValueError):
        list(iter_avi_mjpeg_frames(dib))
    # non-JPEG frame payload rejected at encode
    with pytest.raises(ValueError):
        encode_avi_mjpeg([b"not a jpeg"], 16, 16)
    # foreign compression fourcc rejected by the walk ('XVID')
    xvid = bytearray(data)
    at = xvid.find(b"MJPG", 40)  # strf biCompression (skip strh fourcc)
    at = xvid.find(b"MJPG", at + 1)
    xvid[at : at + 4] = b"XVID"
    with pytest.raises(ValueError):
        list(iter_avi_mjpeg_frames(bytes(xvid)))


def test_mjpeg_spark_stats_path(spark):
    from river_spark.operators.avi import decode_avi_mjpeg_stats, encode_avi_mjpeg
    from river_spark.operators.jpeg import decode_jpeg, ycbcr_to_rgb_int

    d, nf, wb, hb = 11, 5, 2, 2
    frames = [_const_block_jpeg(d, f, wb, hb) for f in range(nf)]
    data = encode_avi_mjpeg(frames, 8 * wb, 8 * hb, fps=14)
    df = spark.createDataFrame(
        [(1, bytearray(data)), (2, bytearray(b"RIFFjunk"))],
        "doc_id long, payload binary",
    )
    rows = {
        r["doc_id"]: r
        for r in decode_avi_mjpeg_stats(df, "doc_id", "payload").collect()
    }
    assert rows[2]["ok"] is False
    r1 = rows[1]
    # recompute expectations straight from the JPEG decoder (sampled 0,2,4)
    rs = gs = bs = fwy = 0
    for f in (0, 2, 4):
        w, h, planes = decode_jpeg(frames[f])
        r, g, b = ycbcr_to_rgb_int(*planes)
        rs += int(r.astype(np.int64).sum())
        gs += int(g.astype(np.int64).sum())
        bs += int(b.astype(np.int64).sum())
        fwy += (f + 1) * int(planes[0].astype(np.int64).sum())
    assert r1["ok"] and (r1["width"], r1["height"], r1["fps"]) == (16, 16, 14)
    assert r1["n_sampled"] == 3
    assert (r1["r_sum"], r1["g_sum"], r1["b_sum"]) == (rs, gs, bs)
    assert r1["frame_weighted_y"] == fwy


# ---------------------------------------------------------------------------
# round-13: interleaved audio+video (multi-stream RIFF)
# ---------------------------------------------------------------------------


def test_av_interleave_roundtrip_and_order():
    from river_spark.operators.avi import (
        encode_avi_av,
        extract_avi_audio,
        iter_avi_frames,
    )

    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 256, (6, 8, 3)).astype(np.uint8) for _ in range(5)]
    audio = rng.integers(-1000, 1000, 333).astype(np.int16)
    data = encode_avi_av(frames, audio, fps=12, sample_rate=16000)
    rate, nch, got = extract_avi_audio(data)
    assert (rate, nch) == (16000, 1)
    np.testing.assert_array_equal(got, audio)   # slice reassembly ORDER
    vids = list(iter_avi_frames(data))
    assert [fi for fi, _ in vids] == list(range(5))
    for (fi, f), orig in zip(vids, frames):
        np.testing.assert_array_equal(f, orig)


def test_av_frame_sampling_skips_audio_chunks():
    from river_spark.operators.avi import encode_avi_av, iter_avi_frames

    frames = [np.full((8, 8, 3), f, dtype=np.uint8) for f in range(6)]
    audio = np.arange(100, dtype=np.int16)
    data = encode_avi_av(frames, audio)
    got = [(fi, int(f[0, 0, 0])) for fi, f in iter_avi_frames(data, every_k=3)]
    assert got == [(0, 0), (3, 3)]


def test_av_reject_paths():
    from river_spark.operators.avi import encode_avi_av, extract_avi_audio, encode_avi

    frames = [np.zeros((8, 8, 3), dtype=np.uint8)]
    with pytest.raises(ValueError):
        encode_avi_av(frames, np.array([], dtype=np.int16))
    with pytest.raises(ValueError):
        extract_avi_audio(encode_avi(frames))  # no audio stream
    data = bytearray(encode_avi_av(frames, np.arange(50, dtype=np.int16)))
    # corrupt the WAVEFORMATEX format tag -> non-PCM rejected
    at = data.find(b"auds")
    strf = data.find(b"strf", at)
    data[strf + 8] = 2  # ADPCM tag
    with pytest.raises(ValueError):
        extract_avi_audio(bytes(data))


def test_av_spark_stats_path(spark):
    from river_spark.operators.avi import decode_avi_av_stats, encode_avi_av

    rng = np.random.default_rng(4)
    frames = [rng.integers(0, 256, (8, 12, 3)).astype(np.uint8) for _ in range(5)]
    audio = rng.integers(-500, 500, 250).astype(np.int16)
    data = encode_avi_av(frames, audio, fps=15, sample_rate=12000)
    df = spark.createDataFrame(
        [(1, bytearray(data)), (2, bytearray(b"RIFFxxxxAVI "))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r
            for r in decode_avi_av_stats(df, "doc_id", "payload").collect()}
    assert rows[2]["ok"] is False
    r1 = rows[1]
    rs = fwr = 0
    for fi in (0, 2, 4):
        fr = int(frames[fi][:, :, 0].astype(np.int64).sum())
        rs += fr
        fwr += (fi + 1) * fr
    a64 = audio.astype(np.int64)
    wgt = np.arange(a64.size, dtype=np.int64) % 997 + 1
    assert r1["ok"] and (r1["width"], r1["height"], r1["fps"]) == (12, 8, 15)
    assert (r1["n_sampled"], r1["r_sum"], r1["frame_weighted_r"]) == (3, rs, fwr)
    assert (r1["sample_rate"], r1["n_audio"]) == (12000, 250)
    assert r1["audio_sum"] == int(a64.sum())
    assert r1["audio_pw_sum"] == int((wgt * a64).sum())
