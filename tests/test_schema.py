"""Schema kernel tests — mirror the reference's schema/writer validation
(cpp/src/tests/writer_test.cpp, python binding semantics river.pyx:85-226)."""

import numpy as np
import pytest
from pyspark.sql import types as T

from river_spark.schema import (
    FieldDefinition,
    FieldType,
    SchemaError,
    StreamSchema,
    validate_stream_name,
)


def full_schema():
    return StreamSchema(
        [
            FieldDefinition("d", FieldType.DOUBLE),
            FieldDefinition("f", FieldType.FLOAT),
            FieldDefinition("i16", FieldType.INT16),
            FieldDefinition("i32", FieldType.INT32),
            FieldDefinition("i64", FieldType.INT64),
            FieldDefinition("fw", FieldType.FIXED_WIDTH_BYTES, size=5),
        ]
    )


def test_default_sizes():
    assert FieldDefinition("a", FieldType.DOUBLE).size == 8
    assert FieldDefinition("a", FieldType.FLOAT).size == 4
    assert FieldDefinition("a", FieldType.INT16).size == 2
    assert FieldDefinition("a", FieldType.INT32).size == 4
    assert FieldDefinition("a", FieldType.INT64).size == 8


def test_fixed_width_requires_size():
    with pytest.raises(SchemaError):
        FieldDefinition("a", FieldType.FIXED_WIDTH_BYTES)


def test_sample_size():
    assert full_schema().sample_size() == 8 + 4 + 2 + 4 + 8 + 5


def test_json_roundtrip():
    s = full_schema()
    assert StreamSchema.from_json(s.to_json()) == s
    # wire format keys match cpp/src/schema.cpp:12-48
    import json

    obj = json.loads(s.to_json())
    fd = obj["field_definitions"][0]
    assert set(fd) == {"name", "size", "type"}
    assert fd["type"] == "DOUBLE"


def test_variable_width_must_be_sole_field():
    with pytest.raises(SchemaError):
        StreamSchema(
            [
                FieldDefinition("a", FieldType.DOUBLE),
                FieldDefinition("v", FieldType.VARIABLE_WIDTH_BYTES, size=10),
            ]
        )
    StreamSchema([FieldDefinition("v", FieldType.VARIABLE_WIDTH_BYTES, size=10)])


def test_duplicate_names_rejected():
    with pytest.raises(SchemaError):
        StreamSchema([FieldDefinition("a", FieldType.DOUBLE), FieldDefinition("a", FieldType.INT32)])


def test_dtype_roundtrip():
    s = full_schema()
    dt = s.dtype()
    assert dt.itemsize == s.sample_size()
    assert StreamSchema.from_dtype(dt) == s
    assert dt.names == ("d", "f", "i16", "i32", "i64", "fw")


def test_struct_type():
    st = full_schema().to_struct_type()
    assert [f.dataType for f in st.fields] == [
        T.DoubleType(),
        T.FloatType(),
        T.ShortType(),
        T.IntegerType(),
        T.LongType(),
        T.BinaryType(),
    ]
    assert all(not f.nullable for f in st.fields)
    st2 = full_schema().to_struct_type(include_system_columns=True)
    assert [f.name for f in st2.fields[:3]] == ["sample_index", "key", "timestamp_ms"]


def test_stream_name_validation():
    validate_stream_name("ok")
    with pytest.raises(SchemaError):
        validate_stream_name("")
    with pytest.raises(SchemaError):
        validate_stream_name("x" * 300)


def test_from_struct_type_keeps_user_columns_named_like_system_columns():
    """A user column named 'key' must survive unless the full system trio
    is present (an ingested frame): silent drops lose data on the sink
    create path."""
    from pyspark.sql import types as T

    st = T.StructType(
        [T.StructField("key", T.LongType()), T.StructField("value", T.DoubleType())]
    )
    s = StreamSchema.from_struct_type(st)
    assert s.field_names() == ["key", "value"]
    # full trio -> stripped (ingested-frame round trip)
    st2 = T.StructType(
        [
            T.StructField("sample_index", T.LongType()),
            T.StructField("key", T.StringType()),
            T.StructField("timestamp_ms", T.LongType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    assert StreamSchema.from_struct_type(st2).field_names() == ["v"]


def test_from_struct_type_rejects_binary_in_multifield_schema():
    from pyspark.sql import types as T

    st = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.BinaryType())]
    )
    with pytest.raises(SchemaError, match="explicit size"):
        StreamSchema.from_struct_type(st)
    # sole binary field still infers the variable-width shape
    lone = T.StructType([T.StructField("payload", T.BinaryType())])
    s = StreamSchema.from_struct_type(lone)
    assert s.field_definitions[0].type is FieldType.VARIABLE_WIDTH_BYTES


def test_stream_name_rejects_path_separators():
    for bad in ("../escape", "a/b", "a\\b", ".", "..", "nul\x00byte"):
        with pytest.raises(SchemaError, match="path separators|1\\.\\."):
            validate_stream_name(bad)
    validate_stream_name("fine-name_2")  # hyphens/underscores stay legal


def test_from_json_malformed_raises_schema_error():
    """Wire metadata (a foreign or corrupted writer's Redis hash) must
    fail as a diagnosable SchemaError, never a bare KeyError/TypeError
    (round-15 transport robustness audit)."""
    import pytest

    from river_spark.schema import SchemaError, StreamSchema

    for bad in (
        "{}",
        "[]",
        "null",
        '{"field_definitions": 3}',
        '{"field_definitions": [{"name": 1}]}',
        '{"field_definitions": [{"name": "x", "type": "NOPE", "size": 8}]}',
        '{"field_definitions": [{"name": "x", "type": "DOUBLE"}]}',
    ):
        with pytest.raises(SchemaError):
            StreamSchema.from_json(bad)
