"""Compression tests — mirror cpp/src/tests/compressor_test.cpp: lossless
bit-exact round trip on int16 sine waves with ≥10% size reduction, plus
transparent end-to-end decompression through reader, ingester, and the
Spark DataSource; ZFP gated like the reference's noop build."""

import os

import numpy as np
import pytest

from river_spark.schema import FieldDefinition, FieldType, SchemaError, StreamSchema
from river_spark.transport import StreamLog, StreamReader, StreamWriter
from river_spark.transport.compression import CompressionMode, Compressor


def sine_samples(n=4096, channels=4):
    """64-channel int16 sines like the reference's golden fixture
    (compressor_test.cpp:12-23)."""
    schema = StreamSchema([FieldDefinition(f"ch{i}", FieldType.INT16) for i in range(channels)])
    arr = np.zeros(n, dtype=schema.dtype())
    t = np.arange(n)
    for i in range(channels):
        arr[f"ch{i}"] = (10000 * np.sin(t / (50.0 + i))).astype(np.int16)
    return schema, arr


def test_zlib_roundtrip_bit_exact_and_smaller():
    schema, arr = sine_samples()
    c = Compressor(CompressionMode.ZLIB_LOSSLESS, {"sample_size": schema.sample_size()})
    raw = arr.tobytes()
    comp = c.compress(raw)
    assert len(comp) < 0.9 * len(raw)  # >=10% reduction (compressor_test.cpp:109-119)
    assert c.decompress(comp) == raw  # bit-exact


def test_dummy_passthrough():
    c = Compressor(CompressionMode.DUMMY)
    assert c.compress(b"abc") == b"abc" and c.decompress(b"abc") == b"abc"


def test_zfp_gated():
    with pytest.raises(NotImplementedError):
        Compressor(CompressionMode.ZFP_LOSSLESS)


def test_params_json_roundtrip():
    import json

    c = Compressor(CompressionMode.ZLIB_LOSSLESS, {"level": 6})
    # reference wire shape (cpp/src/writer.cpp:89-95): name + string params
    assert json.loads(c.params_json()) == {
        "name": "ZLIB_LOSSLESS",
        "params": {"level": "6"},
    }
    c2 = Compressor.from_params_json(c.params_json())
    assert c2.mode is CompressionMode.ZLIB_LOSSLESS and int(c2.params["level"]) == 6
    assert Compressor.from_params_json(None).mode is CompressionMode.UNCOMPRESSED
    # legacy flat form still readable
    legacy = Compressor.from_params_json('{"mode": "ZLIB_LOSSLESS", "level": 6}')
    assert legacy.mode is CompressionMode.ZLIB_LOSSLESS and legacy.params == {"level": 6}


def test_transparent_reader_decompression(tmp_path):
    log = StreamLog(str(tmp_path / "store"))
    schema, arr = sine_samples(n=2000)
    w = StreamWriter(log, batch_size=256, compression=Compressor(CompressionMode.ZLIB_LOSSLESS))
    w.initialize("comp", schema)
    w.write(arr)
    w.stop()
    # on-disk bytes are compressed
    disk = sum(
        os.path.getsize(os.path.join(d, f))
        for d, _, fs in os.walk(log.stream_dir("comp"))
        for f in fs
    )
    assert disk < 0.9 * arr.nbytes
    # reader is oblivious
    r = StreamReader(log).initialize("comp")
    res = r.read(5000, timeout_ms=100)
    assert res.count == 2000
    np.testing.assert_array_equal(res.samples["ch0"], arr["ch0"])


def test_compression_rejects_variable_width(tmp_path):
    log = StreamLog(str(tmp_path / "store"))
    schema = StreamSchema([FieldDefinition("v", FieldType.VARIABLE_WIDTH_BYTES, size=8)])
    w = StreamWriter(log, compression=Compressor(CompressionMode.ZLIB_LOSSLESS))
    with pytest.raises(SchemaError):
        w.initialize("vw", schema)


def test_spark_source_reads_compressed(spark, tmp_path):
    from pyspark.sql import functions as F

    from river_spark.sources import register

    log = StreamLog(str(tmp_path / "store"))
    schema, arr = sine_samples(n=1000)
    w = StreamWriter(log, batch_size=128, compression=Compressor(CompressionMode.ZLIB_LOSSLESS))
    w.initialize("sp", schema)
    w.write(arr)
    w.stop()
    register(spark)
    df = spark.read.format("river").option("path", str(tmp_path / "store")).option("stream", "sp").load()
    assert df.count() == 1000
    got = df.orderBy("sample_index").select("ch0").toPandas()["ch0"].to_numpy()
    np.testing.assert_array_equal(got, arr["ch0"])


def test_ingester_reads_compressed(tmp_path):
    import pyarrow.parquet as pq

    from river_spark.ingest import IngestResult
    from river_spark.ingest.ingester import SingleStreamIngester
    from river_spark.ingest.settings import StreamIngestionSettings

    log = StreamLog(str(tmp_path / "store"))
    schema, arr = sine_samples(n=1500)
    w = StreamWriter(log, batch_size=200, compression=Compressor(CompressionMode.ZLIB_LOSSLESS))
    w.initialize("ing", schema)
    w.write(arr)
    w.stop()
    s = StreamIngestionSettings(minimum_age_seconds_before_deletion=0)
    res = SingleStreamIngester(log, str(tmp_path / "out"), "ing", s).ingest()
    assert res is IngestResult.COMPLETED
    t = pq.read_table(str(tmp_path / "out" / "ing" / "data.parquet"))
    np.testing.assert_array_equal(t.column("ch1").to_numpy(), arr["ch1"])


def test_quant_lossy_roundtrip_correlation(tmp_path):
    """Lossy acceptance mirrors compressor_test.cpp:147-167: strong
    reduction + Pearson correlation >= 0.95 against the original, and the
    abs-tolerance contract holds per value."""
    log = StreamLog(str(tmp_path / "store"))
    schema = StreamSchema([FieldDefinition("sig", FieldType.DOUBLE)])
    tol = 1e-3
    w = StreamWriter(
        log,
        batch_size=512,
        compression=Compressor(CompressionMode.QUANT_LOSSY, {"tolerance": tol}),
    )
    w.initialize("lossy", schema)
    t = np.arange(8192)
    arr = np.zeros(len(t), dtype=schema.dtype())
    arr["sig"] = np.sin(t / 40.0) * 3.0 + 0.1 * np.sin(t / 3.0)
    w.write(arr)
    w.stop()
    disk = sum(
        os.path.getsize(os.path.join(d, f))
        for d, _, fs in os.walk(log.stream_dir("lossy"))
        for f in fs
    )
    assert disk < 0.5 * arr.nbytes  # strong reduction
    r = StreamReader(log).initialize("lossy")
    got = []
    while True:
        res = r.read(10_000, timeout_ms=100)
        if res.eof or res.count == 0:
            break
        got.append(res.samples["sig"].copy())
    back = np.concatenate(got)
    assert len(back) == len(arr)
    assert np.abs(back - arr["sig"]).max() <= tol / 2 + 1e-12  # abs-tolerance contract
    corr = np.corrcoef(back, arr["sig"])[0, 1]
    assert corr >= 0.95


def test_quant_lossy_rejects_mixed_dtypes(tmp_path):
    log = StreamLog(str(tmp_path / "store"))
    schema = StreamSchema(
        [FieldDefinition("a", FieldType.DOUBLE), FieldDefinition("b", FieldType.INT16)]
    )
    w = StreamWriter(log, compression=Compressor(CompressionMode.QUANT_LOSSY))
    with pytest.raises(SchemaError):
        w.initialize("bad", schema)


def test_int16_promote_demote_roundtrip_all_values():
    """The zfp int16 wire semantics (promote <<15, demote >>15 with clamp,
    zfp_compressor.cpp:107-123/155-170) must round-trip every int16
    exactly — this is what makes a future real-zfp backend lossless for
    int16 streams at tolerance 0."""
    import numpy as np

    from river_spark.transport.compression import demote_int16, promote_int16

    vals = np.arange(-0x8000, 0x8000, dtype=np.int16)
    assert (demote_int16(promote_int16(vals)) == vals).all()
    # demotion clamps out-of-range int32s like the reference
    hot = np.array([np.iinfo(np.int32).max, np.iinfo(np.int32).min], dtype=np.int32)
    assert demote_int16(hot).tolist() == [0x7FFF, -0x8000]


def test_from_params_json_malformed_raises_value_error():
    """Same wire-metadata contract as StreamSchema.from_json: malformed
    compression params raise ValueError with the payload quoted, never
    a bare KeyError/TypeError (round-15 transport robustness audit)."""
    import pytest

    from river_spark.transport.compression import Compressor

    for bad in ("{}", "[]", "1", "null", '{"name": 5}', '{"mode": 99}',
                '{"name": "zlib", "params": 3}', "not json"):
        with pytest.raises(ValueError):
            Compressor.from_params_json(bad)
    # the empty/None fast path still yields the uncompressed identity
    c = Compressor.from_params_json(None)
    assert c.decompress(b"abc") == b"abc"
