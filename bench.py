"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.

Methodology: each benchmarked query is first executed once at sf0.001 to
compile its whole-stage-codegen classes and JIT the hot paths (plan shape
is identical across scale factors, so this warms exactly the code the
timed run executes, with negligible data volume), then timed at the
target scale factor as full execution through ``df.count()`` — i.e., what
a user pays in steady state. ``spark.catalog.clearCache()`` runs between
queries so operators that persist intermediates (the LSH families) cannot
leak executor memory into the next measurement."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from river_spark.queries.registry import QUERIES
from river_spark.session import get_spark


def transport_throughput() -> dict[str, float]:
    """Reference benchmark config: 1M samples x 8 B, batch 10240
    (cpp/src/tools/river_benchmark.cpp:22-30); BASELINE.md reports
    >30 MB/s write and read for the reference transport."""
    import tempfile

    import numpy as np

    from river_spark.schema import FieldDefinition, FieldType, StreamSchema
    from river_spark.transport import StreamLog, StreamReader, StreamWriter

    log = StreamLog(tempfile.mkdtemp(prefix="river_bench_"))
    schema = StreamSchema([FieldDefinition("v", FieldType.DOUBLE)])
    n = 1_000_000
    arr = np.zeros(n, dtype=schema.dtype())
    arr["v"] = np.arange(n)
    w = StreamWriter(log, batch_size=10240).initialize("bench", schema)
    t0 = time.perf_counter()
    w.write(arr)
    w.stop()
    t_write = time.perf_counter() - t0
    mb = n * 8 / 1e6
    r = StreamReader(log).initialize("bench")
    t0 = time.perf_counter()
    while True:
        res = r.read(100_000, timeout_ms=10)
        if res.eof or res.count == 0:
            break
    t_read = time.perf_counter() - t0
    return {
        "transport_write_mb_s": round(mb / t_write, 1),
        "transport_read_mb_s": round(mb / t_read, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("river_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + parquet footer caches
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    bench = {name: q for name, q in QUERIES.items() if q.bench}

    # codegen/JIT warmup at the smallest SF: identical plan shapes, ~0 data
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and os.path.abspath(warm_dir) != os.path.abspath(sf_dir):
        for name, q in bench.items():
            try:
                q.fn(spark, warm_dir).count()
            except Exception as exc:  # pragma: no cover - warmup is best-effort
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)
            spark.catalog.clearCache()

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name, q in bench.items():
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        n = df.count() if df.isStreaming is False else -1
        timings[name] = round(time.perf_counter() - t0, 4)
        spark.catalog.clearCache()
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
    total = round(time.perf_counter() - t_all, 4)

    tp = transport_throughput()
    print(f"# transport: {tp}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                **tp,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
