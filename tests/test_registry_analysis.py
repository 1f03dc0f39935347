"""Registry-wide analysis smoke: every registered query must at least
resolve its schema against the CURRENT testdata (analysis only — no jobs
run). This is the canary for testdata drift: when the driver regenerates a
table with a new physical type (as happened to events.ts in round 3, INT64
nanos → timestamp[us]), every affected query fails HERE in seconds instead
of silently rotting behind stale correctness rows."""

import pytest

from river_spark.queries import get_queries

_ALL = sorted(get_queries().items())


@pytest.mark.parametrize("name,fn", _ALL, ids=[n for n, _ in _ALL])
def test_query_analyzes(spark, sf_dir, name, fn):
    df = fn(spark, sf_dir)
    # .schema forces full analysis (column resolution + type checking)
    # without triggering execution.
    assert len(df.schema.fields) > 0, name
