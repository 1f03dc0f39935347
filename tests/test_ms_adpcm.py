"""MS-ADPCM (operators/ms_adpcm.py): decoder pinned against an
independent scalar reference implementation of the public spec,
encoder/decoder behavioral properties (seed exactness, linear
extrapolation, channel separation, tracking error bounds), and reject
paths. Pure codec tests — no Spark."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from river_spark.operators.ms_adpcm import (
    MS_ADAPTATION,
    MS_COEFS,
    decode_ms_adpcm_wav,
    encode_ms_adpcm_wav,
)


def _reference_decode(payload: bytes):
    """Independent scalar MS-ADPCM decoder written straight from the
    public spec text (no shared helpers with the module)."""
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos: pos + 4]
        n = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            fmt = payload[pos + 8: pos + 8 + n]
        elif cid == b"data":
            data = payload[pos + 8: pos + 8 + n]
        pos += 8 + n + (n & 1)
    tag, nch, rate = struct.unpack_from("<HHI", fmt, 0)
    align = struct.unpack_from("<H", fmt, 12)[0]
    spb, ncoef = struct.unpack_from("<HH", fmt, 18)
    coefs = [struct.unpack_from("<hh", fmt, 22 + 4 * i) for i in range(ncoef)]
    adapt = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]
    out = []
    for b0 in range(0, len(data), align):
        blk = data[b0: b0 + align]
        pred_i = list(blk[:nch])
        o = nch
        idelta = list(struct.unpack_from("<" + "h" * nch, blk, o)); o += 2 * nch
        s1 = list(struct.unpack_from("<" + "h" * nch, blk, o)); o += 2 * nch
        s2 = list(struct.unpack_from("<" + "h" * nch, blk, o)); o += 2 * nch
        hist = [[s2[c], s1[c]] for c in range(nch)]
        nib = []
        for i in range(((spb - 2) * nch + 1) // 2):
            nib += [blk[o + i] >> 4, blk[o + i] & 15]
        for k in range((spb - 2) * nch):
            c = k % nch
            c1, c2 = coefs[pred_i[c]]
            n_u = nib[k]
            signed = n_u - 16 if n_u >= 8 else n_u
            pred = (hist[c][-1] * c1 + hist[c][-2] * c2) >> 8
            v = max(-32768, min(32767, pred + signed * idelta[c]))
            idelta[c] = max(16, (adapt[n_u] * idelta[c]) >> 8)
            hist[c].append(v)
        for k in range(spb):
            for c in range(nch):
                out.append(hist[c][k])
    return rate, nch, out


@pytest.mark.parametrize("nch", [1, 2])
@pytest.mark.parametrize("kind", ["sine", "noise", "ramp"])
def test_decoder_matches_independent_reference(nch, kind):
    rng = np.random.default_rng(11)
    n = 384 * nch
    if kind == "sine":
        s = (5000 * np.sin(np.arange(n) / 7.0)).astype(np.int64)
    elif kind == "noise":
        s = rng.integers(-20000, 20000, n)
    else:
        s = (np.arange(n) * 37 % 30000) - 15000
    payload = encode_ms_adpcm_wav(22050, nch, s, samples_per_block=128)
    rate, c, got = decode_ms_adpcm_wav(payload)
    rrate, rc, ref = _reference_decode(payload)
    assert (rate, c) == (rrate, rc) == (22050, nch)
    assert [int(x) for x in got] == ref


def test_block_seeds_exact_and_tracking_bounded():
    t = np.arange(512)
    sig = (3000 * np.sin(t / 10.0)).astype(np.int64)
    _, _, out = decode_ms_adpcm_wav(
        encode_ms_adpcm_wav(8000, 1, sig, samples_per_block=128))
    for b in range(4):
        assert out[b * 128] == sig[b * 128]
        assert out[b * 128 + 1] == sig[b * 128 + 1]
    err = np.abs(out.astype(np.int64) - sig)
    assert err.max() < 1000  # smooth signal tracks within ~3% FS


def test_linear_ramp_exact_and_channel_separation():
    """Coefficient pair 1 (512, -256) extrapolates linear signals
    EXACTLY (pred = 2*s1 - s2), so a ramp reconstructs losslessly; in
    stereo the constant channel must stay bit-constant (nibble
    interleave cannot leak across channels)."""
    fr = np.zeros((256, 2), np.int64)
    fr[:, 0] = 1000
    fr[:, 1] = np.arange(256) * 50 - 6000
    _, _, out = decode_ms_adpcm_wav(
        encode_ms_adpcm_wav(16000, 2, fr.reshape(-1), samples_per_block=128))
    o = out.reshape(-1, 2)
    assert np.all(o[:, 0] == 1000)
    assert np.array_equal(o[:, 1].astype(np.int64), fr[:, 1])


def test_fixed_predictor_and_spec_tables():
    assert MS_COEFS.tolist() == [[256, 0], [512, -256], [0, 0], [192, 64],
                                 [240, 0], [460, -208], [392, -232]]
    assert MS_ADAPTATION.tolist() == [230, 230, 230, 230, 307, 409, 512, 614,
                                      768, 614, 512, 409, 307, 230, 230, 230]
    s = (np.arange(256) * 13 % 9000) - 4500
    for pi in range(7):
        payload = encode_ms_adpcm_wav(8000, 1, s, samples_per_block=128,
                                      predictor=pi)
        # predictor byte of each block header carries the pinned index
        data_at = payload.index(b"data") + 8
        assert payload[data_at] == pi
        _, _, out = decode_ms_adpcm_wav(payload)
        assert out.size == 256


def test_reject_paths():
    s = np.zeros(256, np.int64)
    payload = bytearray(encode_ms_adpcm_wav(8000, 1, s, samples_per_block=128))
    at = payload.index(b"fmt ") + 8
    bad = bytearray(payload); struct.pack_into("<H", bad, at, 17)
    with pytest.raises(ValueError, match="not MS-ADPCM"):
        decode_ms_adpcm_wav(bytes(bad))
    bad = bytearray(payload); struct.pack_into("<H", bad, at + 12, 999)
    with pytest.raises(ValueError, match="block align"):
        decode_ms_adpcm_wav(bytes(bad))
    # predictor index outside the table
    data_at = payload.index(b"data") + 8
    bad = bytearray(payload); bad[data_at] = 9
    with pytest.raises(ValueError, match="predictor index"):
        decode_ms_adpcm_wav(bytes(bad))
    with pytest.raises(ValueError, match="whole blocks"):
        encode_ms_adpcm_wav(8000, 1, np.zeros(100, np.int64),
                            samples_per_block=128)
    with pytest.raises(ValueError, match="channels"):
        encode_ms_adpcm_wav(8000, 3, np.zeros(384, np.int64))
