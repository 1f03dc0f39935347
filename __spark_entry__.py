"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the river_spark query registry
(river_spark/queries/registry.py). Every implemented operator from
SURVEY.md §2 has a ``queries()`` entry; SQL-expressible ones also have a
DuckDB ``oracle_sql()`` entry with identical output column names.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from river_spark.queries import get_oracle_sql, get_queries
from river_spark.queries.relational import q1_pricing_summary


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-style pricing
    summary (filter → hash-agg with partial aggregation)."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return get_queries()


def oracle_sql() -> dict[str, str]:
    return get_oracle_sql()
