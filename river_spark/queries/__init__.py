"""Judged query registry.

Every operator the engine claims (SURVEY.md §2 Part A/B + the
training-data-pipeline extensions) is exposed here as a named query:
a Spark callable ``fn(spark, sf_dir) -> DataFrame`` plus, where
SQL-expressible, a DuckDB oracle SQL string over the same tables.
``__spark_entry__.py`` is a thin re-export of this registry.
"""

from river_spark.queries.registry import QUERIES, Query, get_queries, get_oracle_sql

__all__ = ["QUERIES", "Query", "get_queries", "get_oracle_sql"]
