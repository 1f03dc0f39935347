"""One-off registry-wide timing sweep (optimization round 15).

Times EVERY registry query at a given SF with the bench methodology
(full execution via df.count(), clearCache() between queries) to find
heavy non-bench queries worth a plan audit. Not part of the driver
contract; writes /tmp/registry_sweep_<sf>.json.

Usage: python tools_sweep_timing.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

from river_spark.queries.registry import QUERIES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("registry-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    errs: dict[str, str] = {}
    names = sorted(QUERIES)
    for i, name in enumerate(names):
        q = QUERIES[name]
        best = None
        try:
            for _ in range(runs):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"sweep:{name}")
                t0 = time.monotonic()
                df = q.fn(spark, sf_dir)
                if getattr(df, "isStreaming", False):
                    best = -1.0
                    break
                df.count()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
        except Exception as e:  # noqa: BLE001
            errs[name] = f"{type(e).__name__}: {e}"[:300]
            continue
        out[name] = round(best, 4)
        if (i + 1) % 25 == 0:
            print(f"[{i+1}/{len(names)}] done", flush=True)
    spark.catalog.clearCache()
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"/tmp/registry_sweep_{tag}.json"
    with open(path, "w") as f:
        json.dump({"sf_dir": sf_dir, "runs": runs, "timings": out, "errors": errs}, f, indent=1)
    print(f"wrote {path}; {len(out)} timed, {len(errs)} errors")
    for name, t in sorted(out.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{t:8.3f}  {name}")


if __name__ == "__main__":
    main()
