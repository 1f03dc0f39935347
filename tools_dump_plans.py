"""Dump .explain('formatted') for named registry queries to plans/<dir>/.

Usage: python tools_dump_plans.py <out_subdir> <suffix> <query> [query ...]
e.g.:  python tools_dump_plans.py r16 before dedup_ngram_jaccard dedup_minhash_lsh
"""

import os
import sys

from river_spark.session import get_spark
from river_spark.queries import QUERIES


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("river_spark_plans")
    spark.sparkContext.setLogLevel("ERROR")
    base = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", out_dir)
    os.makedirs(base, exist_ok=True)
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(base, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
