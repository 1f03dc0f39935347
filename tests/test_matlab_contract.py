"""Layout contract for the pure-M MATLAB binding (matlab/*.m).

The container has no MATLAB/Octave runtime (matlab/README.md), so the
binding's EXECUTION is env-gated — but every byte-level assumption its
M-code makes about the file backend is pinned here against real Python
writer output, by re-implementing the documented M algorithms
(offset-typecast record decode, npy-header regex parse, filename
grammar, control-marker walk) in Python and asserting they reproduce
the data exactly. If a transport change ever breaks these, the M
binding broke too — this suite is the tripwire.

The fixture is the SAME one matlab/run_tests.m reads
(river_spark/tools/matlab_fixture.write_fixture), so a MATLAB
environment can verify cross-language equality with one command.
"""

from __future__ import annotations

import io
import json
import os
import re
import struct
import zipfile

import numpy as np
import pytest

from river_spark.schema import FieldDefinition, FieldType, StreamSchema
from river_spark.tools.matlab_fixture import write_fixture

_BATCH_RE = re.compile(r"^batch_(\d{12})_(\d+)_(\d+)_(\d+)\.(bin|npz)$")


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("matlab_fixture"))
    write_fixture(root)
    return root


def test_schema_is_packed_little_endian():
    """StreamSchema.m computes offsets as cumulative sizes: true only
    if the numpy structured dtype is PACKED (no alignment padding) and
    little-endian."""
    s = StreamSchema(
        [
            FieldDefinition("a", FieldType.INT16),
            FieldDefinition("b", FieldType.DOUBLE),
            FieldDefinition("c", FieldType.FLOAT),
            FieldDefinition("d", FieldType.FIXED_WIDTH_BYTES, size=3),
            FieldDefinition("e", FieldType.INT64),
        ]
    )
    dt = s.dtype()
    off = 0
    for f in s.field_definitions:
        assert dt.fields[f.name][1] == off, f"{f.name}: not packed"
        off += f.size
    assert dt.itemsize == off
    for name in ("a", "b", "c", "e"):
        sub = dt.fields[name][0]
        assert sub.byteorder in ("<", "="), name
    assert struct.pack("<h", 1) == np.int16(1).tobytes()  # platform LE


def test_metadata_json_fields(fixture_root):
    meta = json.load(open(os.path.join(fixture_root, "mx_fixture", "metadata.json")))
    # the exact keys StreamReader.m::initialize reads
    assert set(meta) >= {"first_segment", "schema", "user_metadata", "entries_per_segment"}
    sch = json.loads(meta["schema"])
    for fd in sch["field_definitions"]:
        assert set(fd) == {"name", "size", "type"}
        assert fd["type"] in {t.value for t in FieldType}


def test_batch_filename_grammar_and_bin_sizing(fixture_root):
    sdir = os.path.join(fixture_root, "mx_fixture", "segment_000000")
    schema = StreamSchema(
        [FieldDefinition("x", FieldType.DOUBLE), FieldDefinition("k", FieldType.INT64)]
    )
    n_files = 0
    for fname in os.listdir(sdir):
        if fname.endswith(".json"):
            continue
        m = _BATCH_RE.match(fname)
        assert m, f"unparseable batch name {fname}"
        n = int(m.group(2))
        size = os.path.getsize(os.path.join(sdir, fname))
        assert size == n * schema.dtype().itemsize
        n_files += 1
    assert n_files > 0


def _matlab_decode_bin(path: str, schema: StreamSchema, n: int) -> dict:
    """The EXACT algorithm StreamReader.m::decode_batch_ runs: reshape
    to (itemsize, n) column records, slice each field's byte rows,
    typecast little-endian."""
    raw = np.fromfile(path, dtype=np.uint8)
    assert raw.size == n * schema.dtype().itemsize
    rec = raw.reshape(n, schema.dtype().itemsize).T  # (itemsize, n)
    out = {}
    off = 0
    for f in schema.field_definitions:
        col = rec[off : off + f.size, :]
        if f.type is FieldType.DOUBLE:
            out[f.name] = col.T.copy().view("<f8").reshape(-1)
        elif f.type is FieldType.INT64:
            out[f.name] = col.T.copy().view("<i8").reshape(-1)
        off += f.size
    return out


def test_bin_decode_walk_reproduces_data(fixture_root):
    """Full M-algorithm walk: batches in filename order, tombstone hop,
    EOF stop — must reproduce the 100 written samples exactly."""
    schema = StreamSchema(
        [FieldDefinition("x", FieldType.DOUBLE), FieldDefinition("k", FieldType.INT64)]
    )
    stream = os.path.join(fixture_root, "mx_fixture")
    seg = 0
    xs, ks = [], []
    hops = 0
    while True:
        sdir = os.path.join(stream, f"segment_{seg:06d}")
        batches = []
        for fname in os.listdir(sdir):
            m = _BATCH_RE.match(fname)
            if m:
                batches.append((int(m.group(1)), int(m.group(2)), fname))
        for start, n, fname in sorted(batches):
            cols = _matlab_decode_bin(os.path.join(sdir, fname), schema, n)
            xs.extend(cols["x"])
            ks.extend(cols["k"])
        eof = os.path.join(sdir, "eof.json")
        tomb = os.path.join(sdir, "tombstone.json")
        if os.path.exists(eof):
            ctl = json.load(open(eof))
            assert set(ctl) >= {"eof", "sample_index"}
            assert ctl["sample_index"] == len(xs) - 1  # LAST index, not count
            break
        ctl = json.load(open(tomb))
        assert set(ctl) >= {"tombstone", "next_segment", "sample_index"}
        seg = ctl["next_segment"]
        hops += 1
    assert hops >= 1, "fixture must force a segment hop (entries_per_segment=64)"
    assert ks == list(range(100))
    assert xs == [i * 0.25 for i in range(100)]


def test_npz_members_parse_like_the_m_code(fixture_root):
    """StreamReader.m::read_npy_ assumptions: npz = ZIP of v1.0 .npy
    members named data/sizes, header regex-parsable, descr |u1 / <i8,
    C order; payload reassembly by sizes must give the written bytes."""
    sdir = os.path.join(fixture_root, "mx_varwidth", "segment_000000")
    npzs = [f for f in os.listdir(sdir) if f.endswith(".npz")]
    assert npzs
    payloads = []
    for fname in sorted(npzs):
        with zipfile.ZipFile(os.path.join(sdir, fname)) as z:
            assert set(z.namelist()) == {"data.npy", "sizes.npy"}
            members = {}
            for member in z.namelist():
                raw = z.read(member)
                assert raw[:6] == b"\x93NUMPY"
                major, minor = raw[6], raw[7]
                assert major == 1, "M parser supports npy v1.0 only"
                (hlen,) = struct.unpack_from("<H", raw, 8)
                header = raw[10 : 10 + hlen].decode()
                descr = re.search(r"'descr':\s*'([^']+)'", header).group(1)
                assert "'fortran_order': False" in header
                shape = re.search(r"'shape':\s*\(([^)]*)\)", header).group(1)
                count = 1
                for tok in re.findall(r"\d+", shape):
                    count *= int(tok)
                body = raw[10 + hlen :]
                if member == "data.npy":
                    assert descr in ("|u1", "<u1")
                    members["data"] = np.frombuffer(body, dtype=np.uint8, count=count)
                else:
                    assert descr == "<i8"
                    members["sizes"] = np.frombuffer(body, dtype="<i8", count=count)
            off = 0
            for s in members["sizes"]:
                payloads.append(bytes(members["data"][off : off + s]))
                off += int(s)
    assert payloads == [b"alpha", b"", b"gamma-gamma"]


def test_matlab_writer_layout_is_python_readable(tmp_path):
    """The inverse direction: a stream laid out the way StreamWriter.m
    writes it (packed .bin + minimal metadata.json + eof.json) must
    read back through the PYTHON reader — so tables written from MATLAB
    flow into Spark ingest unchanged."""
    from river_spark.transport import StreamLog
    from river_spark.transport.reader import StreamReader as PyReader

    root = str(tmp_path)
    schema = StreamSchema(
        [FieldDefinition("x", FieldType.DOUBLE), FieldDefinition("k", FieldType.INT64)]
    )
    sdir = os.path.join(root, "mwrit", "segment_000000")
    os.makedirs(sdir)
    # metadata.json exactly as StreamWriter.m::initialize emits it
    meta = {
        "first_segment": 0,
        "schema": schema.to_json(),
        "initialized_at_us": 1_700_000_000_000_000,
        "user_metadata": {"origin": "matlab"},
        "entries_per_segment": 16777216,
    }
    with open(os.path.join(root, "mwrit", "metadata.json"), "w") as f:
        json.dump(meta, f)
    # one packed batch, column-major record fill like the M code (the
    # bytes on disk are record-major either way)
    arr = np.zeros(7, dtype=schema.dtype())
    arr["x"] = np.arange(7) * 1.5
    arr["k"] = np.arange(7) + 10
    with open(os.path.join(sdir, "batch_000000000000_7_1700000000000_0.bin"), "wb") as f:
        f.write(arr.tobytes())
    with open(os.path.join(sdir, "eof.json"), "w") as f:
        json.dump({"eof": 1, "sample_index": 6}, f)  # LAST sample index

    r = PyReader(StreamLog(root))
    r.initialize("mwrit")
    res = r.read(10, timeout_ms=2000)
    assert res.count == 7
    assert list(res.samples["k"][:7]) == list(range(10, 17))
    assert list(res.samples["x"][:7]) == [i * 1.5 for i in range(7)]
    assert r.metadata()["origin"] == "matlab"
    r.stop()


def test_m_sources_stay_in_sync_with_contract():
    """Grep-level tripwires: the .m files must keep reading the names
    this contract pins (if someone renames eof.json or the batch stem,
    both sides must move together)."""
    base = os.path.join(os.path.dirname(__file__), "..", "matlab")
    reader = open(os.path.join(base, "StreamReader.m")).read()
    writer = open(os.path.join(base, "StreamWriter.m")).read()
    for token in ("metadata.json", "eof.json", "tombstone.json",
                  "segment_%06d", "batch_", "\\x93NUMPY".encode().decode()):
        assert token.replace("\\x93", "") or True
    for token in ("metadata.json", "eof.json", "tombstone.json", "segment_%06d"):
        assert token in reader, token
    assert "batch_(\\d{12})_(\\d+)_(\\d+)_(\\d+)" in reader
    for token in ("metadata.json", "eof.json", "segment_%06d", "batch_%012d_%d_%d_%d"):
        assert token in writer, token
    assert "147 uint8('NUMPY')" in reader  # \x93NUMPY magic
