"""Property-based fuzz of the round-14 codec widenings: randomized
signals and knob combinations through the pure-numpy FLAC and TIFF
codecs, asserting exact losslessness. No Spark involved, so example
counts can be generous — these are the bit-level paths where an
off-by-one lives (partition boundaries, wasted-bit shifts, tile-edge
padding)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from river_spark.operators.flac import decode_flac, encode_flac
from river_spark.operators.tiff import decode_tiff, encode_tiff

_SETTINGS = dict(max_examples=25, deadline=None, derandomize=True)


@given(
    n=st.integers(2, 700),
    seed=st.integers(0, 2**31 - 1),
    amp=st.sampled_from([3, 200, 4000, 32767]),
    shift=st.integers(0, 3),
    block=st.sampled_from([64, 128, 192, 256]),
    orders=st.sampled_from([(0,), (1,), (3,), (0, 1, 2, 3, 4)]),
    wasted=st.booleans(),
    lpc=st.sampled_from([(), (2, 4, 8)]),
)
@settings(**_SETTINGS)
def test_flac_mono_lossless_under_all_knobs(n, seed, amp, shift, block,
                                            orders, wasted, lpc):
    rng = np.random.default_rng(seed)
    x = rng.integers(-amp - 1, amp + 1, n).astype(np.int64)
    x = np.clip(x << shift, -32768, 32767).astype(np.int16)
    data = encode_flac(8000, x, block_size=block, partition_orders=orders,
                       detect_wasted=wasted, lpc_orders=lpc)
    rate, out = decode_flac(data)
    assert rate == 8000
    assert np.array_equal(out, x)


@given(
    n=st.integers(2, 500),
    seed=st.integers(0, 2**31 - 1),
    mode=st.sampled_from(["auto", "cycle"]),
    orders=st.sampled_from([(0,), (0, 1, 2)]),
    wasted=st.booleans(),
)
@settings(**_SETTINGS)
def test_flac_stereo_lossless_under_all_knobs(n, seed, mode, orders, wasted):
    rng = np.random.default_rng(seed)
    # correlated pair (keeps side channels plausible) incl. extremes
    left = rng.integers(-32768, 32768, n)
    right = np.clip(left + rng.integers(-300, 301, n), -32768, 32767)
    s = np.stack([left, right], axis=1).astype(np.int16)
    data = encode_flac(16000, s, block_size=128, channel_mode=mode,
                       partition_orders=orders, detect_wasted=wasted,
                       lpc_orders=(2, 4))
    _, out = decode_flac(data)
    assert np.array_equal(out, s)


@given(
    w=st.integers(1, 70),
    h=st.integers(1, 70),
    seed=st.integers(0, 2**31 - 1),
    rgb=st.booleans(),
    comp=st.sampled_from([1, 5, 32773]),
    pred=st.sampled_from([1, 2]),
    tile=st.sampled_from([None, (16, 16), (32, 16), (16, 48)]),
)
@settings(**_SETTINGS)
def test_tiff_lossless_under_all_knobs(w, h, seed, rgb, comp, pred, tile):
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    img = rng.integers(0, 256, shape).astype(np.uint8)
    data = encode_tiff(img, compression=comp, predictor=pred, tile_size=tile)
    dw, dh, out = decode_tiff(data)
    assert (dw, dh) == (w, h)
    assert np.array_equal(out, img)
