"""ZFP parity tests against the reference's own compressor test vector.

The reference's compressor suite (cpp/src/tests/compressor_test.cpp:12-23)
documents the exact recipe of its golden input
(resources/compressor_input_sines.dat — 64 samples x 4096 channels of
int16 sines); we regenerate it from that recipe, assert byte-equality
with the shipped fixture when the reference tree is present, and run the
reference's acceptance criteria (lossless bit-exactness + <0.9x size;
lossy Pearson correlation >= 0.95 at tolerance 20,
compressor_test.cpp:113-170) through our compressors.

The real-ZFP modes need zfpy (absent in this container — the modes are
import-gated like the reference's noop build); those tests skip here and
run verbatim in any environment with zfpy installed, where equal params
(2-D num_cols field, full header, reversible / accuracy mode, int16
promote) make zfpy emit the reference's exact codestream bytes."""

import os

import numpy as np
import pytest

from river_spark.transport.compression import (
    CompressionMode,
    Compressor,
    demote_int16,
    promote_int16,
)

_REF_FIXTURE = "/root/reference/cpp/src/tests/resources/compressor_input_sines.dat"
N_SAMPLES, N_CHS = 64, 4096


def sines_int16() -> np.ndarray:
    """The documented fixture recipe, compressor_test.cpp:12-23."""
    phases = np.linspace(0, np.pi, N_CHS)
    freqs = np.linspace(1, 10, N_CHS)
    output = np.sin(freqs * np.arange(N_SAMPLES).reshape((-1, 1)) / 10 + phases)
    return (output * (2**14)).astype(np.int16)


def _corr(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.corrcoef(a.astype(np.float64), b.astype(np.float64))[0, 1])


@pytest.mark.skipif(not os.path.exists(_REF_FIXTURE), reason="reference tree absent")
def test_recipe_regenerates_reference_fixture_bytes():
    """Our regenerated vector IS the reference's golden input, byte for
    byte — so every assertion below runs on the reference's own data."""
    with open(_REF_FIXTURE, "rb") as f:
        golden = f.read()
    assert sines_int16().tobytes() == golden


def test_promote_demote_roundtrip_on_fixture():
    """int16→int32 promotion must shift into the high bits and demote
    back exactly (zfp_compressor.cpp:107-123,155-170) for every fixture
    value plus the clamp corners."""
    vals = np.concatenate(
        [sines_int16().ravel(), np.array([-0x8000, -1, 0, 1, 0x7FFF], dtype=np.int16)]
    )
    promoted = promote_int16(vals)
    assert promoted.dtype == np.int32
    np.testing.assert_array_equal(promoted, vals.astype(np.int32) << 15)
    np.testing.assert_array_equal(demote_int16(promoted), vals)


def test_lossless_acceptance_on_reference_vector():
    """The reference's lossless criteria (compressor_test.cpp:108-120):
    bit-exact round trip and compressed size < 0.9x raw — applied to our
    working lossless codec on the reference's own vector."""
    raw = sines_int16().tobytes()
    c = Compressor(CompressionMode.ZLIB_LOSSLESS, {"sample_size": 2 * N_CHS})
    comp = c.compress(raw)
    assert len(comp) < 0.9 * len(raw)
    assert c.decompress(comp) == raw


def test_lossy_acceptance_on_reference_vector():
    """The reference's lossy criteria (TestZfpLossy_Float,
    compressor_test.cpp:147-170): float data, tolerance 20, compressed
    < 0.9x raw, Pearson correlation >= 0.95 after the round trip."""
    vals = sines_int16().astype(np.float32).ravel()
    c = Compressor(
        CompressionMode.QUANT_LOSSY, {"tolerance": 20.0, "value_dtype": "<f4"}
    )
    comp = c.compress(vals.tobytes())
    assert len(comp) < 0.9 * vals.nbytes
    back = np.frombuffer(c.decompress(comp), dtype=np.float32)
    assert np.abs(back - vals).max() <= 10.0 + 1e-6  # abs-tolerance contract: tol/2
    assert _corr(vals.ravel(), back) >= 0.95


# ---------------------------------------------------------------------------
# ZFP codestream HEADER parity: pure Python, runs IN THIS CONTAINER.
# The first 96 bits of every reference/zfpy blob are fully determined by
# (num_cols, num_rows, data_type, tolerance); transport/zfp_header.py
# re-implements that layout from the public zfp format, and
# Compressor._zfp_compress asserts zfpy's output opens with exactly
# these bytes wherever zfpy exists — so these tests pin the wire
# contract's header half without the codec installed.
# ---------------------------------------------------------------------------
from river_spark.transport.zfp_header import (
    MODE_REVERSIBLE,
    expected_header,
    mode_value,
    parse_header,
)


def test_zfp_header_reference_lossless_config():
    """The reference lossless test config (compressor_test.cpp:123-140:
    4096 cols x 64 rows, int16 promoted to an int32 field, reversible):
    header round-trips through parse with the exact field/mode values."""
    hdr = expected_header(N_CHS, N_SAMPLES, "int32", None)
    assert len(hdr) == 12
    assert hdr[:4] == b"zfp\x05"  # magic + codec version 5
    p = parse_header(hdr + b"payload-follows")
    assert p == {
        "codec_version": 5,
        "data_type": "int32",
        "dims": 2,
        "ny": N_SAMPLES,
        "nx": N_CHS,
        "mode_raw": MODE_REVERSIBLE,
        "mode": "reversible",
    }


def test_zfp_header_reference_lossy_config():
    """The reference lossy config (TestZfpLossy_Float, tolerance 20):
    zfp_stream_set_accuracy maps tol 20 to minexp 4 (2^4 <= 20 < 2^5),
    compact mode 4 + 3250 = 3254."""
    assert mode_value(20.0) == 3254
    p = parse_header(expected_header(N_CHS, N_SAMPLES, "float", 20.0))
    assert (p["mode"], p["minexp"], p["data_type"]) == ("accuracy", 4, "float")
    # tolerance 0 pins minexp at ZFP_MIN_EXP (near-lossless accuracy)
    assert parse_header(expected_header(4, 4, "double", 0.0))["minexp"] == -1074


def test_zfp_header_hand_computed_bytes():
    """Independent hand computation of the full 96-bit layout for a
    1x1 double reversible field: magic 0x0570667a in bytes 0-3, meta
    ((0<<24|0)<<2|dims-1)<<2|type-1 = 7 in bytes 4-7, mode 4094 = 0xFFE
    in the top 12 bits of bytes 8-11 (LSB-first packing)."""
    assert expected_header(1, 1, "double", None) == bytes.fromhex(
        "7a66700507000000" "0000e0ff"
    )


def test_zfp_header_rejects_foreign_blobs():
    with pytest.raises(ValueError, match="magic"):
        parse_header(b"not-a-zfp-stream")
    with pytest.raises(ValueError, match="short"):
        parse_header(b"zfp")


# ---------------------------------------------------------------------------
# Real-ZFP codec parity: the remaining two tests need the codec itself
# and skip without zfpy (absent in this container; no network to build
# golden fixtures — see TESTDATA.md). They run verbatim wherever zfpy
# exists, where _zfp_compress additionally hard-asserts the emitted
# codestream starts with expected_header (the header/codec bridge).
# ---------------------------------------------------------------------------
def test_zfpy_codec_parity_all_modes():
    """Mirror of TestZfpLossless_{Int16,Float,Double} + TestZfpLossy_Float
    (compressor_test.cpp:123-170): num_cols=4096 2-D field; reversible
    mode bit-exact at < 0.9x size for all three dtypes; accuracy mode at
    tolerance 20 keeps Pearson correlation >= 0.95."""
    pytest.importorskip("zfpy")
    for data_type, cast in (
        ("int16", np.int16),
        ("float", np.float32),
        ("double", np.float64),
    ):
        vals = sines_int16().astype(cast)
        c = Compressor(
            CompressionMode.ZFP_LOSSLESS, {"num_cols": N_CHS, "data_type": data_type}
        )
        comp = c.compress(vals.tobytes())
        assert len(comp) < 0.9 * vals.nbytes
        assert parse_header(comp)["mode"] == "reversible"
        back = np.frombuffer(c.decompress(comp), dtype=cast)
        np.testing.assert_array_equal(back, vals.ravel())

    vals = sines_int16().astype(np.float32)
    c = Compressor(
        CompressionMode.ZFP_LOSSY,
        {"num_cols": N_CHS, "data_type": "float", "tolerance": 20.0},
    )
    comp = c.compress(vals.tobytes())
    assert len(comp) < 0.9 * vals.nbytes
    assert parse_header(comp)["mode_raw"] == 3254
    back = np.frombuffer(c.decompress(comp), dtype=np.float32)
    assert _corr(vals.ravel(), back) >= 0.95


def test_zfp_writer_reader_end_to_end(tmp_path):
    """A21 with the real codec: writer derives the reference params
    (num_cols/data_type) from the schema, reader self-configures from
    the metadata JSON and returns the exact samples."""
    pytest.importorskip("zfpy")
    from river_spark.schema import FieldDefinition, FieldType, StreamSchema
    from river_spark.transport import StreamLog, StreamReader, StreamWriter

    log = StreamLog(str(tmp_path / "store"))
    schema = StreamSchema(
        [FieldDefinition("a", FieldType.DOUBLE), FieldDefinition("b", FieldType.DOUBLE)]
    )
    w = StreamWriter(log, compression=Compressor(CompressionMode.ZFP_LOSSLESS))
    w.initialize("zfp_rt", schema)
    assert w.compression.params["num_cols"] == 2
    assert w.compression.params["data_type"] == "double"
    arr = np.zeros(1000, dtype=schema.dtype())
    arr["a"] = np.sin(np.arange(1000) / 10)
    arr["b"] = np.cos(np.arange(1000) / 10)
    w.write(arr)
    w.stop()
    res = StreamReader(log).initialize("zfp_rt").read(2000, timeout_ms=100)
    assert res.count == 1000
    np.testing.assert_array_equal(res.samples["a"], arr["a"])
    np.testing.assert_array_equal(res.samples["b"], arr["b"])
