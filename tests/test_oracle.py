"""Local replica of the driver's correctness gate: run every registry
query on Spark AND its DuckDB oracle, compare row count, column names,
and order-insensitive values. Float columns must match EXACTLY after the
in-query rounding — any residual diff is a value-hash risk flagged here
before the driver sees it.

Rounding-midpoint hazard (learned from win_distribution_functions at
sf0.1): round(x, k) on a value that is an EXACT decimal midpoint
(e.g. cume_dist = 333/640 = 0.5203125 at k=6) diverges between engines —
Spark rounds half-up, DuckDB half-even. Pure integer-ratio outputs are
bit-identical across engines UNROUNDED (IEEE division of identical
ints), so when a ratio's denominator can be dyadic (2^a*5^b groups),
emit the raw double instead of rounding."""

import math
import os

import duckdb
import pandas as pd
import pytest

from river_spark.queries import QUERIES
from river_spark.session import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


ORACLE_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(name, spark, ddb, sf_dir):
    q = QUERIES[name]
    got = q.fn(spark, sf_dir).toPandas()
    exp = ddb.execute(q.oracle).df()
    assert len(got) == len(exp), f"{name}: rows {len(got)} != oracle {len(exp)}"
    assert len(got) > 0, f"{name}: empty result — query proves nothing"
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(exp.columns)}"
    )
    # dtype-width parity: the driver's canonicalizer has tolerated
    # int32/int64 drift so far, but it is a standing schema-gate risk —
    # pin that both engines agree on physical width (e.g. Spark datediff
    # is INT while DuckDB's is BIGINT; cast in the query, not here)
    dtype_diff = [
        (c, str(got[c].dtype), str(exp[c].dtype))
        for c in got.columns
        if str(got[c].dtype) != str(exp[c].dtype)
    ]
    assert not dtype_diff, f"{name}: dtype drift {dtype_diff}"
    g, e = _canon(got), _canon(exp)
    for c in g.columns:
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                # BIT-level equality: the driver hashes raw values, so
                # -0.0 vs 0.0 or NaN-payload drift would slip past ==
                import struct

                assert struct.pack("<d", a) == struct.pack("<d", b), (
                    f"{name}.{c}[{i}]: {a!r} !≡ {b!r} (bit-level hash risk)"
                )
            else:
                assert str(a) == str(b), f"{name}.{c}[{i}]: {a!r} != {b!r}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(name, spark, sf_dir):
    df = QUERIES[name].fn(spark, sf_dir)
    assert df.count() >= 0
