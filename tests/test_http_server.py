"""HTTP read API tests (A23 parity, cpp/ingester/src/ingester_http_server.cpp):
list streams, single-stream metadata, parquet download byte-identical."""

import json
import os
import urllib.request

import numpy as np
import pytest

from river_spark.ingest import IngesterSettings, StreamIngester, StreamIngestionSettings
from river_spark.schema import FieldDefinition, FieldType, StreamSchema
from river_spark.tools.http_server import IngesterHttpServer
from river_spark.transport import StreamLog, StreamWriter


@pytest.fixture
def ingested(tmp_path):
    log = StreamLog(str(tmp_path / "store"))
    schema = StreamSchema([FieldDefinition("v", FieldType.DOUBLE)])
    for name in ("web_a", "web_b"):
        w = StreamWriter(log).initialize(name, schema, user_metadata={"src": name})
        arr = np.zeros(40, dtype=schema.dtype())
        arr["v"] = np.arange(40)
        w.write(arr)
        w.stop()
    out = str(tmp_path / "out")
    ing = StreamIngester(
        log, out, IngesterSettings(streams=[StreamIngestionSettings(minimum_age_seconds_before_deletion=0)])
    )
    ing.ingest()
    ing.wait_all()
    return out


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.read()


def test_http_endpoints(ingested):
    with IngesterHttpServer(ingested) as base:
        code, body = _get(f"{base}/api/streams")
        assert code == 200
        streams = json.loads(body)["streams"]
        assert set(streams) == {"web_a", "web_b"}
        assert streams["web_a"]["user_metadata"] == {"src": "web_a"}

        code, body = _get(f"{base}/api/streams/web_b")
        assert code == 200 and json.loads(body)["stream_name"] == "web_b"

        code, body = _get(f"{base}/api/streams/web_a/data.parquet")
        assert code == 200
        on_disk = open(os.path.join(ingested, "web_a", "data.parquet"), "rb").read()
        assert body == on_disk  # byte-identical download

        with pytest.raises(urllib.error.HTTPError) as e:
            _get(f"{base}/api/streams/nope")
        assert e.value.code == 404


def test_http_rejects_path_traversal(ingested, tmp_path):
    """The stream-name URL segment is a filesystem component: '..' (and
    anything with a separator) must 404, never serve files above the
    output root."""
    # plant a secret beside the output root that ../ would reach
    with open(os.path.join(os.path.dirname(ingested), "metadata.json"), "w") as f:
        f.write('{"secret": true}')
    with IngesterHttpServer(ingested) as base:
        for evil in ("..", "%2e%2e", "..%2fweb_a"):
            with pytest.raises(urllib.error.HTTPError) as e:
                _get(f"{base}/api/streams/{evil}")
            assert e.value.code == 404, evil


def test_tiered_layout_served_and_globbable(tmp_path):
    """Round-9 advice: above single_file_max_bytes finalize writes
    data_*.parquet parts and no monolithic data.parquet, but the HTTP
    endpoint and the in-repo readers hardcoded that name — large
    finalized streams silently became unreadable through those
    surfaces. The endpoint must now serve a merged single file for the
    tiered layout (byte-valid parquet, all rows), and data_glob must
    cover both layouts."""
    import io

    import pyarrow.parquet as pq

    from river_spark.ingest.layout import data_files, data_glob, servable_file

    log = StreamLog(str(tmp_path / "store"))
    schema = StreamSchema([FieldDefinition("v", FieldType.DOUBLE)])
    w = StreamWriter(log, batch_size=32).initialize("big", schema)
    arr = np.zeros(300, dtype=schema.dtype())
    arr["v"] = np.arange(300)
    w.write(arr)
    w.stop()
    out = str(tmp_path / "out")
    ing = StreamIngester(
        log,
        out,
        IngesterSettings(
            streams=[
                StreamIngestionSettings(
                    minimum_age_seconds_before_deletion=0,
                    single_file_max_bytes=1,  # force the tiered path
                )
            ]
        ),
    )
    ing.ingest()
    ing.wait_all()
    d = os.path.join(out, "big")
    assert not os.path.exists(os.path.join(d, "data.parquet"))
    files = data_files(d)
    assert files and all(os.path.basename(f).startswith("data_") for f in files)
    # glob layout-independence: covers exactly the data files
    import glob as _glob

    assert sorted(_glob.glob(data_glob(d))) == sorted(files)
    with IngesterHttpServer(out) as base:
        code, body = _get(f"{base}/api/streams/big/data.parquet")
        assert code == 200
        t = pq.read_table(io.BytesIO(body))
        assert t.num_rows == 300
        np.testing.assert_array_equal(np.sort(t.column("v").to_numpy()), arr["v"])
    # the merge cache is reused (same mtime on a second resolve) and
    # dot-prefixed so directory listings/globs skip it
    cache = servable_file(d)
    assert os.path.basename(cache).startswith(".")
    m1 = os.path.getmtime(cache)
    assert servable_file(d) == cache and os.path.getmtime(cache) == m1
    assert cache not in _glob.glob(data_glob(d))
