"""Cross-language fixture generator for the MATLAB binding
(matlab/run_tests.m mode 2): writes, with the PYTHON transport writer,
exactly the streams run_tests.m::test_python_fixture expects —
a fixed-width stream crossing a forced segment boundary (tombstone
hop on the reader side) and a variable-width stream (npz decode path).

Usage: ``python -m river_spark.tools.matlab_fixture <log_root>`` then
``RIVER_SPARK_MATLAB_FIXTURE=<log_root> matlab -batch run_tests`` (or
octave). tests/test_matlab_contract.py uses the same generator to pin
the layout contract in-container."""

from __future__ import annotations

import sys

import numpy as np

from river_spark.schema import FieldDefinition, FieldType, StreamSchema
from river_spark.transport import StreamLog, StreamWriter


def write_fixture(root: str) -> None:
    log = StreamLog(root)

    # fixed width: 100 rows, forced segment hop at 64 samples
    schema = StreamSchema(
        [
            FieldDefinition("x", FieldType.DOUBLE),
            FieldDefinition("k", FieldType.INT64),
        ]
    )
    w = StreamWriter(log, batch_size=16, entries_per_segment=64)
    w.initialize("mx_fixture", schema)
    buf = w.new_buffer(100)
    buf["x"] = np.arange(100) * 0.25
    buf["k"] = np.arange(100)
    w.write(buf)
    w.stop()

    # variable width: 3 payloads incl. an empty one
    vschema = StreamSchema(
        [FieldDefinition("payload", FieldType.VARIABLE_WIDTH_BYTES, size=64)]
    )
    wv = StreamWriter(log, batch_size=16)
    wv.initialize("mx_varwidth", vschema)
    payloads = [b"alpha", b"", b"gamma-gamma"]
    flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    wv.write(flat, sizes=np.array([len(p) for p in payloads], dtype=np.int64))
    wv.stop()


if __name__ == "__main__":
    write_fixture(sys.argv[1])
    print(f"matlab fixture written to {sys.argv[1]}")
