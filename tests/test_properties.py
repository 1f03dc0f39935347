"""Property-based tests (hypothesis): schema round trips and transport
write/read identity under arbitrary batch/segment geometry — the
randomized counterpart of the reference's hand-picked scenarios."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from river_spark.schema import FieldDefinition, FieldType, StreamSchema
from river_spark.transport import StreamLog, StreamReader, StreamWriter

_FIXED_TYPES = [FieldType.DOUBLE, FieldType.FLOAT, FieldType.INT16, FieldType.INT32, FieldType.INT64]

names = st.text(alphabet="abcdefghij_", min_size=1, max_size=8)


@st.composite
def schemas(draw):
    n = draw(st.integers(1, 6))
    fields = []
    used = set()
    for i in range(n):
        name = f"f{i}_" + draw(names)
        if name in used:
            continue
        used.add(name)
        t = draw(st.sampled_from(_FIXED_TYPES + [FieldType.FIXED_WIDTH_BYTES]))
        size = draw(st.integers(1, 16)) if t is FieldType.FIXED_WIDTH_BYTES else None
        fields.append(FieldDefinition(name, t, size))
    return StreamSchema(fields)


@given(schemas())
@settings(max_examples=50, deadline=None)
def test_schema_json_dtype_roundtrip(schema):
    assert StreamSchema.from_json(schema.to_json()) == schema
    assert StreamSchema.from_dtype(schema.dtype()) == schema
    assert schema.dtype().itemsize == schema.sample_size()


@given(
    n=st.integers(1, 500),
    batch_size=st.integers(1, 64),
    entries_per_segment=st.integers(5, 100),
    read_size=st.integers(1, 200),
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_transport_roundtrip_any_geometry(tmp_path_factory, n, batch_size, entries_per_segment, read_size):
    log = StreamLog(str(tmp_path_factory.mktemp("prop")))
    schema = StreamSchema([FieldDefinition("v", FieldType.INT64)])
    w = StreamWriter(log, batch_size=batch_size, entries_per_segment=entries_per_segment)
    w.initialize("p", schema)
    arr = np.zeros(n, dtype=schema.dtype())
    arr["v"] = np.arange(n)
    w.write(arr)
    w.stop()
    r = StreamReader(log).initialize("p")
    got = []
    while True:
        res = r.read(read_size, timeout_ms=50)
        if res.eof:
            break
        if res.count == 0:
            break
        got.append(res.samples["v"].copy())
    out = np.concatenate(got) if got else np.empty(0, np.int64)
    np.testing.assert_array_equal(out, np.arange(n))
    # terminal state: EOF
    assert r.read(1, timeout_ms=10).eof
