"""Property-based checks for the session-4 (waves 10-15) operator
shapes: randomized inputs against independent in-process brute-force
references. Example counts stay small — every example runs Spark jobs.

Each test re-states the query's core expression pipeline inline (the
wave-8 precedent): the registry query itself is pinned bit-level by the
DuckDB oracle gate; these cover the ALGORITHM on adversarial inputs the
fixed tables can't produce (duplicate skyline points, equal-timestamp
interval boundaries, max-age decay clamps, disconnected BFS islands).
"""

import itertools
from fractions import Fraction

import pandas as pd
import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window, functions as F

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)


# ---------------------------------------------------------------------------
# Grid-prefiltered 2-D skyline vs exhaustive dominance
# ---------------------------------------------------------------------------
def _spark_skyline(spark, pts, bucket_width):
    dp = spark.createDataFrame(
        pd.DataFrame(sorted(set(pts)), columns=["x", "y"]).astype("int64")
    )
    bucket = (F.col("x") / bucket_width).cast("bigint")
    grid = dp.groupBy(bucket.alias("bkt")).agg(F.max("y").alias("bkt_max"))
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    grid = grid.select("bkt", F.max("bkt_max").over(wb).alias("prior_max"))
    surv = (
        dp.join(F.broadcast(grid), bucket == F.col("bkt"), "left")
        .filter(F.col("prior_max").isNull() | (F.col("prior_max") < F.col("y")))
        .drop("bkt", "prior_max")
    )
    ws = Window.orderBy(F.col("x").asc(), F.col("y").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    out = (
        surv.withColumn("m", F.max("y").over(ws))
        .filter(F.col("m").isNull() | (F.col("m") < F.col("y")))
        .select("x", "y")
    )
    return {(r.x, r.y) for r in out.collect()}


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 50)), min_size=1, max_size=40
    ),
    bucket_width=st.sampled_from([1, 3, 7, 100]),
)
@settings(**_SETTINGS)
def test_skyline_matches_brute_force(spark, pts, bucket_width):
    dpts = set(pts)
    expected = {
        (x, y)
        for (x, y) in dpts
        if not any(
            (x2 <= x and y2 >= y and (x2 < x or y2 > y)) for (x2, y2) in dpts
        )
    }
    assert _spark_skyline(spark, pts, bucket_width) == expected


# ---------------------------------------------------------------------------
# Sweep-line peak concurrency vs brute-force stabbing
# ---------------------------------------------------------------------------
def _spark_peak(spark, intervals):
    iv = spark.createDataFrame(
        pd.DataFrame(intervals, columns=["t0", "t1"]).astype("int64")
    )
    b = iv.select(F.col("t0").alias("t"), F.lit(1).alias("delta")).unionByName(
        iv.select(F.col("t1").alias("t"), F.lit(-1).alias("delta"))
    )
    w = Window.orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return b.select(F.sum("delta").over(w).alias("c")).agg(F.max("c")).first()[0]


@given(
    iv=st.lists(
        st.tuples(st.integers(0, 30), st.integers(1, 10)), min_size=1, max_size=25
    )
)
@settings(**_SETTINGS)
def test_peak_concurrency_matches_brute_force(spark, iv):
    intervals = [(a, a + d) for a, d in iv]  # half-open [a, a+d)
    # brute force: concurrency can only peak at a start instant
    expected = max(
        sum(1 for (x0, x1) in intervals if x0 <= s < x1)
        for (s, _) in intervals
    )
    assert _spark_peak(spark, intervals) == expected


# ---------------------------------------------------------------------------
# Dyadic-decay accumulator vs exact rational arithmetic
# ---------------------------------------------------------------------------
_MAX_AGE = 24


def _spark_dyadic_ltv(spark, rows):
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["cents", "age"]).astype("int64")
    )
    out = (
        df.withColumn("age", F.least(F.col("age"), F.lit(_MAX_AGE)))
        .agg(
            F.sum(
                F.expr(f"cents * shiftleft(CAST(1 AS BIGINT), {_MAX_AGE} - age)")
            ).alias("units")
        )
        .first()
    )
    return out.units


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10_000_000), st.integers(0, 40)),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_dyadic_ltv_units_are_exact(spark, rows):
    # exact rational reference: sum cents * 2^-min(age, MAX) scaled 2^MAX
    expected = sum(
        Fraction(c, 2 ** min(a, _MAX_AGE)) for c, a in rows
    ) * (2 ** _MAX_AGE)
    assert expected.denominator == 1  # dyadic by construction
    assert _spark_dyadic_ltv(spark, rows) == expected.numerator


# ---------------------------------------------------------------------------
# Iterative BFS vs python BFS (disconnected graphs, islands)
# ---------------------------------------------------------------------------
def _spark_bfs(spark, edges, seed, max_hops):
    e = spark.createDataFrame(
        pd.DataFrame(edges, columns=["pa", "pb"]).astype("int64")
    )
    und = e.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionByName(
        e.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    visited = spark.createDataFrame([(seed, 0)], "nid bigint, hop int")
    frontier = visited.select("nid")
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(und, frontier.nid == und.u)
            .select(F.col("v").alias("nid"))
            .distinct()
            .join(visited.select("nid"), "nid", "left_anti")
            .withColumn("hop", F.lit(hop))
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = visited.filter(F.col("hop") == hop).select("nid")
    return {r.nid: r.hop for r in visited.collect()}


@given(
    raw=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=25
    )
)
@settings(**_SETTINGS)
def test_bfs_hops_match_python_bfs(spark, raw):
    edges = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    assume(edges)
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seed = min(adj)
    expected = {seed: 0}
    frontier = [seed]
    for hop in range(1, 4):
        nxt = sorted(
            {n for f in frontier for n in adj.get(f, ()) if n not in expected}
        )
        for n in nxt:
            expected[n] = hop
        frontier = nxt
    assert _spark_bfs(spark, edges, seed, 3) == expected


# ---------------------------------------------------------------------------
# Rolling distinct (trailing window) vs brute force
# ---------------------------------------------------------------------------
def _spark_rolling_distinct(spark, du, window):
    df = spark.createDataFrame(
        pd.DataFrame(sorted(set(du)), columns=["d", "user_id"]).astype("int64")
    )
    targets = df.select(
        F.explode(
            F.sequence(F.col("d"), F.col("d") + (window - 1))
        ).alias("target_d"),
        "user_id",
    )
    days = df.select("d").distinct()
    out = (
        targets.join(days, targets.target_d == days.d)
        .groupBy("target_d")
        .agg(F.countDistinct("user_id").alias("n"))
    )
    return {r.target_d: r.n for r in out.collect()}


@given(
    du=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 5)), min_size=1, max_size=30
    )
)
@settings(**_SETTINGS)
def test_rolling_distinct_matches_brute_force(spark, du):
    grid = set(du)
    days = sorted({d for d, _ in grid})
    expected = {
        t: len({u for (d, u) in grid if t - 7 < d <= t}) for t in days
    }
    assert _spark_rolling_distinct(spark, grid, 7) == expected


# ---------------------------------------------------------------------------
# Common-neighbors link prediction vs brute-force neighbor sets
# ---------------------------------------------------------------------------
def _spark_common_neighbors(spark, edges):
    e = spark.createDataFrame(
        pd.DataFrame(edges, columns=["pa", "pb"]).astype("int64")
    )
    und = e.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionByName(
        e.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count("*").alias("d"))
    x, y = und.alias("x"), und.alias("y")
    wedge = (
        x.join(y, (F.col("x.u") == F.col("y.u")) & (F.col("x.v") < F.col("y.v")))
        .groupBy(F.col("x.v").alias("a"), F.col("y.v").alias("b"))
        .agg(F.count("*").alias("common"))
    )
    nonadj = wedge.join(e, (wedge.a == e.pa) & (wedge.b == e.pb), "left_anti")
    da = deg.select(F.col("u").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("u").alias("b"), F.col("d").alias("db"))
    out = (
        nonadj.join(da, "a")
        .join(db, "b")
        .select("a", "b", "common", (F.col("da") + F.col("db") - F.col("common")).alias("un"))
    )
    return {(r.a, r.b): (r.common, r.un) for r in out.collect()}


@given(
    raw=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=20
    )
)
@settings(**_SETTINGS)
def test_common_neighbors_matches_brute_force(spark, raw):
    edges = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    assume(edges)
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    eset = set(edges)
    expected = {}
    for a, b in itertools.combinations(sorted(adj), 2):
        if (a, b) in eset:
            continue
        common = len(adj[a] & adj[b])
        if common:
            expected[(a, b)] = (common, len(adj[a] | adj[b]))
    assert _spark_common_neighbors(spark, edges) == expected
