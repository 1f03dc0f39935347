"""Zone-map data-skipping index: stats collection, conservative
pruning, and result equivalence with a full scan."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from river_spark.ingest.zonemap import (
    build_zonemap,
    list_parquet_files,
    prune_files,
    read_pruned,
    write_zonemap,
)

N_FILES = 6
ROWS_PER_FILE = 100


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """6 stat-bearing files with disjoint key ranges (file i holds keys
    [i*100, i*100+99]) plus one file written WITHOUT statistics — the
    conservative-keep case."""
    root = str(tmp_path_factory.mktemp("zm_dataset"))
    for i in range(N_FILES):
        keys = list(range(i * 100, i * 100 + ROWS_PER_FILE))
        t = pa.table(
            {
                "key": pa.array(keys, type=pa.int64()),
                "tag": pa.array([f"t{k % 7}" for k in keys]),
                "val": pa.array([k * 0.5 for k in keys], type=pa.float64()),
            }
        )
        pq.write_table(t, os.path.join(root, f"part-{i:03d}.parquet"))
    nostat = pa.table(
        {
            "key": pa.array([9000, 9001], type=pa.int64()),
            "tag": pa.array(["zz", "zz"]),
            "val": pa.array([1.0, 2.0], type=pa.float64()),
        }
    )
    pq.write_table(
        nostat,
        os.path.join(root, "part-nostat.parquet"),
        write_statistics=False,
    )
    return root


def test_listing_skips_side_files(dataset):
    os.makedirs(os.path.join(dataset, "_zonemap"), exist_ok=True)
    with open(os.path.join(dataset, "_zonemap", "x.parquet"), "w") as f:
        f.write("not data")
    files = list_parquet_files(dataset)
    assert len(files) == N_FILES + 1
    assert all("_zonemap" not in f for f in files)


def test_build_collects_footer_stats(spark, dataset):
    zm = build_zonemap(spark, dataset).toPandas()
    # every (file, column) appears
    assert set(zm["column"]) == {"key", "tag", "val"}
    assert zm["file"].nunique() == N_FILES + 1
    k3 = zm[(zm["column"] == "key") & (zm["file"].str.contains("part-003"))]
    assert k3.iloc[0]["num_lo"] == 300.0 and k3.iloc[0]["num_hi"] == 399.0
    assert k3.iloc[0]["has_stats"] == 1
    assert k3.iloc[0]["num_rows"] == ROWS_PER_FILE
    ns = zm[(zm["column"] == "key") & (zm["file"].str.contains("nostat"))]
    assert ns.iloc[0]["has_stats"] == 0


def test_prune_numeric_range(spark, dataset):
    zm = build_zonemap(spark, dataset).toPandas()
    kept = prune_files(zm, "key", lo=250, hi=320)
    names = [os.path.basename(f) for f in kept]
    # files 2 and 3 intersect; the stats-less file is kept conservatively
    assert names == ["part-002.parquet", "part-003.parquet", "part-nostat.parquet"]


def test_prune_half_open_and_empty(spark, dataset):
    zm = build_zonemap(spark, dataset).toPandas()
    ge = prune_files(zm, "key", lo=480)
    assert [os.path.basename(f) for f in ge] == [
        "part-004.parquet",
        "part-005.parquet",
        "part-nostat.parquet",
    ]
    none_match = prune_files(zm, "key", lo=20000)
    # only the conservative keep survives
    assert [os.path.basename(f) for f in none_match] == ["part-nostat.parquet"]


def test_prune_string_bounds(spark, dataset):
    zm = build_zonemap(spark, dataset).toPandas()
    kept = prune_files(zm, "tag", lo="u", hi="zzz")
    # every stat-bearing file spans t0..t6 < "u"; only nostat survives
    assert [os.path.basename(f) for f in kept] == ["part-nostat.parquet"]


def test_read_pruned_equals_full_scan(spark, dataset):
    zm = build_zonemap(spark, dataset).toPandas()
    got = (
        read_pruned(spark, dataset, "key", lo=250, hi=320, zonemap=zm)
        .orderBy("key")
        .toPandas()
    )
    full = (
        spark.read.parquet(dataset)
        .filter("key >= 250 and key <= 320")
        .orderBy("key")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), full.reset_index(drop=True)
    )
    assert len(got) == 71  # 250..320 inclusive


def test_persisted_index_roundtrip(spark, dataset):
    path = write_zonemap(spark, dataset)
    assert os.path.basename(path) == "_zonemap"
    got = read_pruned(spark, dataset, "key", lo=0, hi=50).orderBy("key").toPandas()
    assert got["key"].tolist() == list(range(0, 51))


def test_ingester_builds_zonemap_on_finalize(spark, tmp_path):
    """StreamIngestionSettings(build_zonemap=True): the ingest path
    itself lands a _zonemap index next to the finalized parquet, and
    pruned reads through it equal a full scan."""
    import numpy as np

    from river_spark.ingest.ingester import SingleStreamIngester
    from river_spark.ingest.settings import StreamIngestionSettings
    from river_spark.schema import FieldDefinition, FieldType, StreamSchema
    from river_spark.transport import StreamLog, StreamWriter

    log = StreamLog(str(tmp_path / "store"))
    schema = StreamSchema(
        [FieldDefinition("x", FieldType.INT64), FieldDefinition("v", FieldType.DOUBLE)]
    )
    w = StreamWriter(log, batch_size=256).initialize("zm_stream", schema)
    arr = np.zeros(1000, dtype=schema.dtype())
    arr["x"] = np.arange(1000)
    arr["v"] = np.arange(1000) * 0.5
    w.write(arr)
    w.stop()
    out_root = str(tmp_path / "out")
    ing = SingleStreamIngester(
        log, out_root, "zm_stream", StreamIngestionSettings(build_zonemap=True)
    )
    ing.ingest()
    root = os.path.join(out_root, "zm_stream")
    zm_path = os.path.join(root, "_zonemap")
    assert os.path.isdir(zm_path)
    zm = pd.read_parquet(zm_path)
    assert set(zm[zm["column"] == "x"]["file"]) == set(list_parquet_files(root))
    got = read_pruned(spark, root, "x", lo=100, hi=200, zonemap=zm)
    assert got.count() == 101


def test_local_rebuild_never_leaves_indexless_window(tmp_path, monkeypatch):
    """Round-9 advice: the stale-generation sweep must run AFTER the new
    index lands (os.replace), so a crash mid-sweep leaves a valid
    part-0.parquet — never a _zonemap directory with no index. Simulated
    crash: os.remove raises on the first stale file; the index must
    already be the NEW generation."""
    from river_spark.ingest.zonemap import write_zonemap_local

    pq.write_table(
        pa.table({"v": pa.array([1.0, 2.0], pa.float64())}),
        str(tmp_path / "data.parquet"),
    )
    out = write_zonemap_local(str(tmp_path))
    # plant a stale Spark-writer generation beside the fresh index
    stale = os.path.join(out, "part-00000-deadbeef.parquet")
    pq.write_table(pa.table({"x": pa.array([0])}), stale)
    open(os.path.join(out, "_SUCCESS"), "w").close()
    # grow the dataset so the new index is observably different
    pq.write_table(
        pa.table({"v": pa.array([3.0], pa.float64())}),
        str(tmp_path / "data2.parquet"),
    )

    real_remove = os.remove
    def crashing_remove(path):
        real_remove(path)
        raise OSError("simulated crash mid-sweep")

    monkeypatch.setattr(os, "remove", crashing_remove)
    with pytest.raises(OSError, match="simulated crash"):
        write_zonemap_local(str(tmp_path))
    monkeypatch.undo()
    # the new-generation index landed before the sweep crashed
    idx = pq.read_table(os.path.join(out, "part-0.parquet")).to_pandas()
    assert {os.path.basename(f) for f in idx["file"]} == {
        "data.parquet",
        "data2.parquet",
    }
    # and a clean rebuild sweeps the remaining stale generation
    write_zonemap_local(str(tmp_path))
    leftovers = [f for f in os.listdir(out) if f != "part-0.parquet"]
    assert leftovers == [], leftovers
