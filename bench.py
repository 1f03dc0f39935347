"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.

Methodology: one warmup execution of a trivial count to absorb JVM/codegen
startup, then each query measured as full execution including the
collect-equivalent (count + write to noop is avoided; we use
``df.collect()`` row materialization semantics via count on cached-free
plans — i.e., what a user pays)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from river_spark.queries.registry import QUERIES
from river_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("river_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + parquet footer caches
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    bench = {name: q for name, q in QUERIES.items() if q.bench}
    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name, q in bench.items():
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        n = df.count() if df.isStreaming is False else -1
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
    total = round(time.perf_counter() - t_all, 4)

    print(
        json.dumps(
            {
                "metric": "headline_queries_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
