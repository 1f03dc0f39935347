"""CLI tool regression tests — drive the actual subcommands through
subprocess like a shell user (cpp/src/tools parity)."""

import json
import subprocess
import sys


def run_cli(args, stdin=None):
    return subprocess.run(
        [sys.executable, "-m", "river_spark.tools.cli", *args],
        input=stdin,
        capture_output=True,
        text=True,
        timeout=120,
        cwd="/root/repo",
    )


def test_writer_reader_roundtrip(tmp_path):
    store = str(tmp_path / "store")
    w = run_cli(
        ["writer", "--path", store, "--stream", "s1", "--schema", "ch:INT32,v:DOUBLE"],
        stdin="1,2.5\n2,3.5\n3,4.5\n",
    )
    assert w.returncode == 0 and "wrote 3 samples" in w.stderr
    r = run_cli(["reader", "--path", store, "--stream", "s1"])
    assert r.returncode == 0
    assert r.stdout.splitlines() == ["ch,v", "1,2.5", "2,3.5", "3,4.5"]


def test_ingest_subcommand(tmp_path):
    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    run_cli(
        ["writer", "--path", store, "--stream", "s2", "--schema", "v:INT64"],
        stdin="\n".join(str(i) for i in range(100)) + "\n",
    )
    res = run_cli(["ingest", "--path", store, "--out", out])
    assert res.returncode == 0 and "COMPLETED" in res.stderr
    import pyarrow.parquet as pq

    t = pq.read_table(f"{out}/s2/data.parquet")
    assert t.num_rows == 100 and t.column("v").to_pylist() == list(range(100))


def test_benchmark_subcommand():
    res = run_cli(["benchmark", "--num-samples", "50000"])
    assert res.returncode == 0
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["write_mb_per_sec"] > 0 and out["read_mb_per_sec"] > 0


def test_writer_bad_schema_errors(tmp_path):
    res = run_cli(
        ["writer", "--path", str(tmp_path / "s"), "--stream", "x", "--schema", "v:NOT_A_TYPE"],
        stdin="",
    )
    assert res.returncode != 0


def test_compact_and_zonemap_subcommands(tmp_path):
    """Ops tooling round trip: write parts -> compact -> index -> the
    index covers exactly the surviving files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "stream"
    d.mkdir()
    for i in range(6):
        pq.write_table(
            pa.table({"key": list(range(i * 10, i * 10 + 10)), "v": [1.0] * 10}),
            str(d / f"data_{i:05d}.parquet"),
        )
    res = run_cli(["compact", "--dir", str(d), "--target-bytes", "4096"])
    assert res.returncode == 0
    stats = json.loads(res.stdout.strip().splitlines()[-1])
    assert stats["files_before"] == 6 and stats["files_after"] < 6

    res = run_cli(["zonemap", "--root", str(d)])
    assert res.returncode == 0
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["files_indexed"] == stats["files_after"]

    import pandas as pd

    zm = pd.read_parquet(out["zonemap"])
    key_stats = zm[zm["column"] == "key"]
    assert key_stats["num_lo"].min() == 0 and key_stats["num_hi"].max() == 59


def test_compact_rebuilds_stale_zonemap(tmp_path):
    """Index-before-compact: compaction rewrites part files, so a
    pre-existing _zonemap would point pruned readers at dead paths.
    The compact subcommand must rebuild it in place."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "stream"
    d.mkdir()
    for i in range(6):
        pq.write_table(
            pa.table({"key": list(range(i * 10, i * 10 + 10)), "v": [1.0] * 10}),
            str(d / f"data_{i:05d}.parquet"),
        )
    res = run_cli(["zonemap", "--root", str(d)])
    assert res.returncode == 0
    zm_path = json.loads(res.stdout.strip().splitlines()[-1])["zonemap"]

    res = run_cli(["compact", "--dir", str(d), "--target-bytes", "4096"])
    assert res.returncode == 0
    stats = json.loads(res.stdout.strip().splitlines()[-1])
    assert stats["zonemap_rebuilt"] == zm_path

    zm = pd.read_parquet(zm_path)
    indexed = set(zm["file"])
    on_disk = {
        str(d / f) for f in os.listdir(d)
        if f.endswith(".parquet")
    }
    assert indexed == on_disk, "index must cover exactly the surviving files"
    assert len(on_disk) == stats["files_after"] < 6


def test_zonemap_local_rebuild_clears_spark_generation(tmp_path):
    """write_zonemap_local over an index previously built by the Spark
    writer (part-00000-<uuid>.parquet + _SUCCESS) must clear the old
    generation, not leave two sets of rows for directory readers."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from river_spark.ingest.zonemap import write_zonemap_local

    d = tmp_path / "stream"
    d.mkdir()
    pq.write_table(
        pa.table({"key": [1, 2, 3]}), str(d / "data_00000.parquet")
    )
    zm_dir = d / "_zonemap"
    zm_dir.mkdir()
    # a fake prior Spark-writer generation
    pq.write_table(
        pa.table({"file": ["dead.parquet"], "column": ["key"]}),
        str(zm_dir / "part-00000-0123abcd.parquet"),
    )
    (zm_dir / "_SUCCESS").touch()

    out = write_zonemap_local(str(d))
    assert out == str(zm_dir)
    assert sorted(os.listdir(zm_dir)) == ["part-0.parquet"]
    zm = pd.read_parquet(str(zm_dir))
    assert set(zm["file"]) == {str(d / "data_00000.parquet")}
