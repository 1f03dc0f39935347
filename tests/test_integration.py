"""Library integration test — port of the reference's concurrency scenario
(cpp/src/tests/integration_test.cpp:100-219): one writer + three concurrent
readers (plain read / tail / interleaved read+tail) with jittered sleeps,
segment rollovers mid-stream, counts reconciling; repeated under
compression (the reference repeats under ZFP modes, :193-218)."""

import random
import threading
import time

import numpy as np
import pytest

from river_spark.schema import FieldDefinition, FieldType, StreamSchema
from river_spark.transport import StreamLog, StreamReader, StreamWriter
from river_spark.transport.compression import CompressionMode, Compressor

N_SAMPLES = 30_000
BATCHES = 60


@pytest.mark.parametrize(
    "compression",
    [CompressionMode.UNCOMPRESSED, CompressionMode.ZLIB_LOSSLESS, CompressionMode.DUMMY],
    ids=["plain", "zlib", "dummy"],
)
def test_writer_with_concurrent_readers(tmp_path, compression):
    log = StreamLog(str(tmp_path / "store"))
    schema = StreamSchema([FieldDefinition("v", FieldType.DOUBLE)])
    rng = random.Random(42)

    def writer():
        w = StreamWriter(
            log,
            batch_size=512,
            entries_per_segment=10_000,  # forces tombstones mid-stream
            compression=Compressor(compression),
        )
        w.initialize("conc", schema)
        per = N_SAMPLES // BATCHES
        for b in range(BATCHES):
            arr = np.zeros(per, dtype=schema.dtype())
            arr["v"] = np.arange(b * per, (b + 1) * per, dtype=np.float64)
            w.write(arr)
            time.sleep(abs(rng.gauss(0.001, 0.0005)))
        w.stop()

    results = {}
    errors = []

    def full_reader():
        try:
            r = StreamReader(log).initialize("conc", timeout_ms=5000)
            got = []
            while True:
                res = r.read(4096, timeout_ms=2000)
                if res.eof:
                    break
                if res.count:
                    got.append(res.samples["v"].copy())
                time.sleep(abs(rng.gauss(0.0005, 0.0003)))
            results["full"] = np.concatenate(got)
        except Exception as e:  # pragma: no cover
            errors.append(("full", e))

    def tail_reader():
        try:
            r = StreamReader(log).initialize("conc", timeout_ms=5000)
            seen, skipped_total = 0, 0
            while True:
                skipped, res = r.tail(timeout_ms=1000)
                if skipped == -1:
                    break
                if res is not None:
                    seen += 1
                    skipped_total += skipped
                time.sleep(abs(rng.gauss(0.002, 0.001)))
            # every sample is either returned by tail or skipped by it
            results["tail"] = (seen, skipped_total)
        except Exception as e:  # pragma: no cover
            errors.append(("tail", e))

    def mixed_reader():
        try:
            r = StreamReader(log).initialize("conc", timeout_ms=5000)
            consumed = 0
            while True:
                if rng.random() < 0.5:
                    res = r.read(1000, timeout_ms=500)
                    if res.eof:
                        break
                    consumed += res.count
                else:
                    skipped, res = r.tail(timeout_ms=500)
                    if skipped == -1:
                        break
                    if res is not None:
                        consumed += skipped + 1
                time.sleep(abs(rng.gauss(0.001, 0.0005)))
            results["mixed"] = consumed
        except Exception as e:  # pragma: no cover
            errors.append(("mixed", e))

    threads = [threading.Thread(target=t) for t in (writer, full_reader, tail_reader, mixed_reader)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    # full reader saw every sample, in order, bit-exact
    np.testing.assert_array_equal(results["full"], np.arange(N_SAMPLES, dtype=np.float64))
    # tail reader's accounting covers the whole stream
    seen, skipped = results["tail"]
    assert seen + skipped == N_SAMPLES
    # mixed reader consumed exactly the whole stream across both APIs
    assert results["mixed"] == N_SAMPLES
