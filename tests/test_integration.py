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


def test_ingester_crash_resume_loop(tmp_path):
    """Reference ingester integration (cpp/ingester/src/integration_test.cpp:
    73-197): writer streams concurrently while the ingester is run
    repeatedly (each run 'crashes' = returns IN_PROGRESS and is restarted
    fresh) until COMPLETED; final parquet equals what was written, no
    gaps, no duplicates."""
    import pyarrow.parquet as pq

    from river_spark.ingest import IngestResult
    from river_spark.ingest.ingester import SingleStreamIngester
    from river_spark.ingest.settings import StreamIngestionSettings

    log = StreamLog(str(tmp_path / "store"))
    schema = StreamSchema([FieldDefinition("v", FieldType.DOUBLE)])
    total = 8000

    def writer():
        w = StreamWriter(log, batch_size=128, entries_per_segment=2000)
        w.initialize("crash", schema)
        for b in range(40):
            arr = np.zeros(total // 40, dtype=schema.dtype())
            arr["v"] = np.arange(b * 200, (b + 1) * 200, dtype=np.float64)
            w.write(arr)
            time.sleep(0.08)  # slower than the ingester's stall timeout
        w.stop()

    t = threading.Thread(target=writer)
    t.start()
    settings = StreamIngestionSettings(
        minimum_age_seconds_before_deletion=0,
        bytes_per_row_group=500 * schema.sample_size(),  # many small part files
    )
    runs = 0
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        # a FRESH ingester instance each run = restart-after-crash
        res = SingleStreamIngester(
            log, str(tmp_path / "out"), "crash", settings, stalled_timeout_ms=20
        ).ingest()
        runs += 1
        if res is IngestResult.COMPLETED:
            break
    t.join()
    assert res is IngestResult.COMPLETED and runs > 1, (res, runs)
    tbl = pq.read_table(str(tmp_path / "out" / "crash" / "data.parquet"))
    assert tbl.num_rows == total
    np.testing.assert_array_equal(
        np.sort(tbl.column("sample_index").to_numpy()), np.arange(total)
    )
    np.testing.assert_array_equal(
        tbl.column("v").to_numpy(), np.arange(total, dtype=np.float64)
    )
