"""Extended-format WAV (operators/wav_ext.py): lossless round trips
across the PCM widths / float / companded / EXTENSIBLE matrix, the
G.711 A-law expansion against an independent scalar reference, and the
reject paths. Pure codec tests — no Spark."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from river_spark.operators.wav_ext import (
    alaw_to_linear,
    decode_wav_ext,
    encode_wav_ext,
)

_SETTINGS = dict(max_examples=25, deadline=None, derandomize=True)


@given(
    seed=st.integers(0, 2**31 - 1),
    bits=st.sampled_from([8, 16, 24, 32]),
    nch=st.integers(1, 8),
    ext=st.booleans(),
    n=st.integers(1, 400),
)
@settings(**_SETTINGS)
def test_pcm_roundtrip(seed, bits, nch, ext, n):
    rng = np.random.default_rng(seed)
    lo, hi = -(1 << (bits - 1)), 1 << (bits - 1)
    s = rng.integers(lo, hi, n * nch)
    rate = int(rng.integers(8000, 192001))
    r, c, b, tag, e, out = decode_wav_ext(
        encode_wav_ext(rate, nch, s, fmt=1, bits=bits, extensible=ext)
    )
    assert (r, c, b, tag, e) == (rate, nch, bits, 1, ext)
    assert np.array_equal(out.astype(np.int64), s)


@given(
    seed=st.integers(0, 2**31 - 1),
    bits=st.sampled_from([32, 64]),
    ext=st.booleans(),
    n=st.integers(1, 300),
)
@settings(**_SETTINGS)
def test_float_roundtrip(seed, bits, ext, n):
    rng = np.random.default_rng(seed)
    s = rng.standard_normal(n).astype(np.float32 if bits == 32 else np.float64)
    r, c, b, tag, e, out = decode_wav_ext(
        encode_wav_ext(48000, 1, s.astype(np.float64), fmt=3, bits=bits,
                       extensible=ext)
    )
    assert (b, tag, e) == (bits, 3, ext)
    assert np.array_equal(out, s)  # bit-exact: f4/f8 passthrough


def _alaw_ref(b: int) -> int:
    """Independent scalar ITU G.711 A-law expansion."""
    u = b ^ 0x55
    seg, mant = (u >> 4) & 7, u & 0x0F
    mag = (mant << 4) + 8 if seg == 0 else ((mant << 4) + 0x108) << (seg - 1)
    return mag if (u & 0x80) else -mag


def test_alaw_full_table_matches_reference():
    lin = alaw_to_linear(np.arange(256, dtype=np.uint8))
    assert lin.dtype == np.int16
    assert [int(x) for x in lin] == [_alaw_ref(b) for b in range(256)]
    # anchors from the ITU reference alaw2linear (16-bit-aligned
    # convention): max magnitude (240 + 0x108) << 6 = 32256 at segment
    # 7, minimum step 8 at segment 0
    assert int(np.abs(lin.astype(np.int32)).max()) == 32256
    assert int(np.abs(lin.astype(np.int32)).min()) == 8


@given(seed=st.integers(0, 2**31 - 1), tag=st.sampled_from([6, 7]),
       ext=st.booleans())
@settings(**_SETTINGS)
def test_companded_roundtrip(seed, tag, ext):
    from river_spark.operators.multimodal import mulaw_to_linear

    rng = np.random.default_rng(seed)
    raw = rng.integers(0, 256, 137).astype(np.uint8)
    r, c, b, t, e, out = decode_wav_ext(
        encode_wav_ext(8000, 1, raw, fmt=tag, bits=8, extensible=ext)
    )
    assert (b, t, e) == (8, tag, ext)
    expected = alaw_to_linear(raw) if tag == 6 else mulaw_to_linear(raw)
    assert np.array_equal(out, expected)


def test_extensible_wire_layout():
    """The extensible fmt chunk is the 40-byte layout real encoders
    write: tag 0xFFFE, cbSize 22, valid-bits, mask, GUID = subtag +
    fixed suffix."""
    s = np.arange(-4, 4)
    payload = encode_wav_ext(44100, 2, s, fmt=1, bits=16, extensible=True,
                             channel_mask=0x3)
    at = payload.index(b"fmt ")
    size = struct.unpack_from("<I", payload, at + 4)[0]
    assert size == 40
    body = payload[at + 8 : at + 8 + size]
    assert struct.unpack_from("<H", body, 0)[0] == 0xFFFE
    assert struct.unpack_from("<H", body, 16)[0] == 22
    assert struct.unpack_from("<H", body, 18)[0] == 16  # valid bits
    assert struct.unpack_from("<I", body, 20)[0] == 0x3  # channel mask
    assert struct.unpack_from("<H", body, 24)[0] == 1  # sub-tag PCM


def test_decode_wav_any_paths_untouched():
    """The standing 16-bit/mu-law core decodes identically through the
    widened entry (regression tripwire for the pinned wire)."""
    from river_spark.operators.multimodal import (
        decode_wav_any, encode_wav, encode_wav_mulaw)

    s = np.arange(-500, 500, dtype=np.int16)
    p16 = encode_wav(16000, 2, s)
    assert np.array_equal(decode_wav_ext(p16)[5], decode_wav_any(p16)[2])
    raw = np.arange(256, dtype=np.uint8).tobytes()
    pmu = encode_wav_mulaw(8000, 1, raw)
    assert np.array_equal(decode_wav_ext(pmu)[5], decode_wav_any(pmu)[2])


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda d: b"RIFX" + d[4:], "not a RIFF"),
        # flip the fmt tag to an unknown value (2 = MS-ADPCM, unsupported)
        (lambda d: d[: d.index(b"fmt ") + 8] + struct.pack("<H", 2)
         + d[d.index(b"fmt ") + 10 :],
         "unsupported WAV format tag|block align"),
        # make data chunk odd-length for a 16-bit stream
        (lambda d: d[:-1] + b"", "truncated|whole number|missing"),
    ],
)
def test_reject_paths(mutate, msg):
    import re

    s = np.arange(-100, 100)
    payload = encode_wav_ext(16000, 2, s, fmt=1, bits=16)
    with pytest.raises(ValueError, match=re.compile(msg)):
        decode_wav_ext(mutate(payload))


def test_reject_bad_guid_and_widths():
    s = np.arange(-10, 10)
    payload = bytearray(encode_wav_ext(16000, 1, s, fmt=1, bits=16,
                                       extensible=True))
    at = payload.index(b"fmt ") + 8
    payload[at + 26] ^= 0xFF  # corrupt the GUID suffix
    with pytest.raises(ValueError, match="SubFormat GUID"):
        decode_wav_ext(bytes(payload))
    with pytest.raises(ValueError, match="unsupported PCM width"):
        encode_wav_ext(8000, 1, s, fmt=1, bits=12)
    with pytest.raises(ValueError, match="companded formats are 8-bit"):
        encode_wav_ext(8000, 1, s, fmt=6, bits=16)


def test_decode_audio_any_dispatch():
    """Round-15 unified audio entry: fLaC magic and every WAV format
    tag route to the right in-repo decoder; unknown containers
    reject."""
    from river_spark.operators.adpcm import encode_adpcm_wav
    from river_spark.operators.flac import encode_flac
    from river_spark.operators.ms_adpcm import encode_ms_adpcm_wav
    from river_spark.operators.wav_ext import decode_audio_any

    rng = np.random.default_rng(91)
    s16 = rng.integers(-30000, 30000, 256).astype(np.int16)
    r, n, out = decode_audio_any(encode_flac(8000, s16))
    assert (r, n) == (8000, 1) and np.array_equal(out, s16)
    st = rng.integers(-30000, 30000, (128, 2)).astype(np.int16)
    r, n, out = decode_audio_any(encode_flac(16000, st))
    assert (r, n) == (16000, 2) and np.array_equal(out.reshape(-1, 2), st)
    s24 = rng.integers(-(1 << 23), 1 << 23, 64)
    r, n, out = decode_audio_any(encode_wav_ext(44100, 2, s24, fmt=1,
                                                bits=24, extensible=True))
    assert (r, n) == (44100, 2) and np.array_equal(out.astype(np.int64), s24)
    r, n, out = decode_audio_any(encode_adpcm_wav(8000, s16))
    assert (r, n) == (8000, 1)
    r, n, out = decode_audio_any(
        encode_ms_adpcm_wav(8000, 1, s16.astype(np.int64),
                            samples_per_block=128))
    assert (r, n) == (8000, 1) and out.size == 256
    with pytest.raises(ValueError, match="unrecognized audio"):
        decode_audio_any(b"OggS....")
