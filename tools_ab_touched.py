"""A/B timing + plan capture for the round-15 session-4 touched queries.

Usage: python tools_ab_touched.py <tag> [runs]
Times each query with the bench methodology (df.count(), clearCache()
between runs, min-of-N) and writes plans/r15/<name>_<tag>.txt with
.explain('formatted'). Writes /tmp/ab_touched_<tag>.json.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

from river_spark.queries.registry import QUERIES

DEFAULT_NAMES = [
    "er_fuzzy_match",
    "mm_flac_multichannel_decode_stats",
    "mm_flac_partitioned_decode_stats",
    "mm_flac_lpc_decode_stats",
    "mm_mjpeg_frame_stats",
    "mm_tiff_tiled_decode_stats",
    "mm_jpeg_prog_decode_stats",
    "mm_flac_decode_stats",
    "mm_bmp_decode_stats",
]


def main() -> None:
    tag = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    NAMES = sys.argv[3].split(",") if len(sys.argv) > 3 else DEFAULT_NAMES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"ab-touched-{tag}")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in NAMES:
        q = QUERIES[name]
        df = q.fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"plans/r15/{name}_{tag}.txt", "w") as f:
            f.write(buf.getvalue())
        best = None
        for _ in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"ab:{tag}:{name}")
            t0 = time.monotonic()
            n = QUERIES[name].fn(spark, sf_dir).count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        rows[name] = n
        print(f"{name}: {best:.2f}s rows={n}", flush=True)
    with open(f"/tmp/ab_touched_{tag}.json", "w") as f:
        json.dump({"timings": out, "rows": rows, "sf_dir": sf_dir}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
