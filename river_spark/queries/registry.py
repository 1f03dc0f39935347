"""Collects every query module into the driver-facing registry."""

from __future__ import annotations

from dataclasses import dataclass

# Importing the modules populates relational.QUERIES via the @q decorator.
import river_spark.queries.relational as _relational  # noqa: F401
import river_spark.queries.events as _events  # noqa: F401
import river_spark.queries.text as _text  # noqa: F401
import river_spark.queries.vectors as _vectors  # noqa: F401
import river_spark.queries.river_ops as _river_ops  # noqa: F401
import river_spark.queries.pipeline as _pipeline  # noqa: F401
import river_spark.queries.relational2 as _relational2  # noqa: F401
import river_spark.queries.udfs as _udfs  # noqa: F401
import river_spark.queries.scale_ops as _scale_ops  # noqa: F401
import river_spark.queries.relational3 as _relational3  # noqa: F401
import river_spark.queries.relational4 as _relational4  # noqa: F401
import river_spark.queries.pipeline_composite as _pipeline_composite  # noqa: F401
from river_spark.queries.relational import QUERIES as _RAW


@dataclass(frozen=True)
class Query:
    name: str
    fn: object
    oracle: str | None
    tags: tuple
    bench: bool


QUERIES: dict[str, Query] = {}
for name, fn, oracle, tags, bench in _RAW:
    if name in QUERIES:
        raise ValueError(f"duplicate query name {name}")
    QUERIES[name] = Query(name, fn, oracle, tags, bench)


def get_queries():
    return {name: q.fn for name, q in QUERIES.items()}


def get_oracle_sql():
    return {name: q.oracle.strip() for name, q in QUERIES.items() if q.oracle is not None}


def bench_queries():
    return {name: q.fn for name, q in QUERIES.items() if q.bench}
