"""Catalog integration + streaming metadata.json emission."""

import json
import os

import numpy as np

from river_spark.catalog import register_streams, stream_metadata
from river_spark.schema import FieldDefinition, FieldType, StreamSchema
from river_spark.transport import StreamLog, StreamWriter


def _mk(store, name, n=50):
    log = StreamLog(store)
    schema = StreamSchema([FieldDefinition("v", FieldType.DOUBLE)])
    w = StreamWriter(log).initialize(name, schema, user_metadata={"origin": "test"})
    arr = np.zeros(n, dtype=schema.dtype())
    arr["v"] = np.arange(n)
    w.write(arr)
    w.stop()
    return log


def test_register_streams_as_views(spark, tmp_path):
    store = str(tmp_path / "store")
    _mk(store, "alpha")
    _mk(store, "beta", n=20)
    views = register_streams(spark, store)
    assert views == ["river_alpha", "river_beta"]
    assert spark.sql("SELECT count(*) AS n FROM river_alpha").collect()[0].n == 50
    assert spark.sql("SELECT max(v) AS m FROM river_beta").collect()[0].m == 19.0
    # catalog surface: the views are listed
    names = {t.name for t in spark.catalog.listTables()}
    assert {"river_alpha", "river_beta"} <= names


def test_stream_metadata_surface(tmp_path):
    store = str(tmp_path / "store")
    _mk(store, "meta_s")
    md = stream_metadata(store, "meta_s")
    assert md["user_metadata"] == {"origin": "test"}
    assert "schema" in md and md["initialized_at_us"] > 0
    assert stream_metadata(store, "missing") is None


def test_streaming_ingest_emits_metadata_json(spark, tmp_path):
    from river_spark.streaming.ingest_query import ingest_streams

    store = str(tmp_path / "store")
    _mk(store, "with_md", n=30)
    out = str(tmp_path / "out")
    ingest_streams(spark, store, out)
    with open(os.path.join(out, "with_md", "metadata.json")) as f:
        md = json.load(f)
    assert md["stream_name"] == "with_md"
    assert md["user_metadata"] == {"origin": "test"}
    assert md["columns"] == ["v"]
    assert spark.read.parquet(os.path.join(out, "with_md")).count() == 30
