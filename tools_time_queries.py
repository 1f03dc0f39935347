"""Time named registry queries with the bench methodology (df.count()
timed, clearCache() between runs, interleaved round-robin repeats).

Usage: python tools_time_queries.py <sf_dir> <repeats> <query> [query ...]
"""

from __future__ import annotations

import sys
import time

from river_spark.session import get_spark
from river_spark.queries import QUERIES


def main() -> None:
    sf_dir, repeats, names = sys.argv[1], int(sys.argv[2]), sys.argv[3:]
    spark = get_spark("river_spark_timer")
    spark.sparkContext.setLogLevel("ERROR")
    # codegen/JIT warmup
    for name in names:
        QUERIES[name].fn(spark, sf_dir).count()
        spark.catalog.clearCache()
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(repeats):
        for name in names:
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).count()
            runs[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    for name in names:
        r = runs[name]
        print(
            f"RESULT {name}: min {min(r):.3f}s of {[round(x, 3) for x in r]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
