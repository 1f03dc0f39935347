"""Property-based checks for the session-3 (wave 8/9) operators:
randomized inputs against independent in-process brute-force
references. Example counts stay small — every example runs Spark jobs.

Each test re-states the query's core expression pipeline inline (the
locf-test precedent): the registry query itself is pinned bit-level by
the DuckDB oracle gate; these cover the ALGORITHM on adversarial inputs
the fixed tables can't produce (disconnected graphs, boundary-cell
points, single-key streams).
"""

import itertools

import pandas as pd
import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from river_spark.queries.relational8 import _cms_bucket_sql, _CMS_W

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)


# ---------------------------------------------------------------------------
# Degree-oriented triangle counting vs brute force
# ---------------------------------------------------------------------------
def _spark_triangle_count(spark, edges):
    e = spark.createDataFrame(
        pd.DataFrame(edges, columns=["pa", "pb"]).astype("int64")
    )
    und = e.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionByName(
        e.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    deg = und.groupBy(F.col("u").alias("nid")).agg(F.count("*").alias("d"))
    ori = (
        und.join(deg.select(F.col("nid").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("nid").alias("v"), F.col("d").alias("dv")), "v")
        .filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select(F.col("u").alias("s"), F.col("v").alias("t"))
    )
    e1, e2 = ori.alias("e1"), ori.alias("e2")
    wedges = e1.join(
        e2, (F.col("e2.s") == F.col("e1.s")) & (F.col("e2.t") != F.col("e1.t"))
    ).select(F.col("e1.t").alias("wb"), F.col("e2.t").alias("wc"))
    closing = ori.select(F.col("s").alias("wb"), F.col("t").alias("wc"))
    return wedges.join(closing, ["wb", "wc"]).count()


@given(
    raw=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=30
    )
)
@settings(**_SETTINGS)
def test_triangle_count_matches_brute_force(spark, raw):
    edges = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    assume(edges)
    adj = set(edges)
    nodes = sorted({n for e in edges for n in e})
    expected = sum(
        1
        for x, y, z in itertools.combinations(nodes, 3)
        if (x, y) in adj and (x, z) in adj and (y, z) in adj
    )
    assert _spark_triangle_count(spark, edges) == expected


# ---------------------------------------------------------------------------
# Grid-bucketed proximity join vs all-pairs
# ---------------------------------------------------------------------------
_CELL = 10


def _spark_grid_pairs(spark, pts):
    df = spark.createDataFrame(
        pd.DataFrame(pts, columns=["id", "x", "y"]).astype("int64")
    )
    offs = F.expr(
        "explode(flatten(transform(array(-1,0,1), dx -> "
        "transform(array(-1,0,1), dy -> struct(dx, dy)))))"
    )
    probe = df.select("id", "x", "y", offs.alias("o")).select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        (F.expr(f"x div {_CELL}") + F.col("o.dx")).alias("cx"),
        (F.expr(f"y div {_CELL}") + F.col("o.dy")).alias("cy"),
    )
    anchor = df.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.expr(f"x div {_CELL}").alias("cx"),
        F.expr(f"y div {_CELL}").alias("cy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    out = (
        probe.join(anchor, ["cx", "cy"])
        .filter((F.col("id_a") < F.col("id_b")) & (d2 <= _CELL * _CELL))
        .select("id_a", "id_b")
        .collect()
    )
    return sorted((r.id_a, r.id_b) for r in out)


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=25,
        unique=True,
    )
)
@settings(**_SETTINGS)
def test_grid_pairs_match_all_pairs(spark, pts):
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    expected = sorted(
        (a[0], b[0])
        for a, b in itertools.combinations(rows, 2)
        if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= _CELL * _CELL
    )
    got = _spark_grid_pairs(spark, rows)
    # exactly-once guarantee: no duplicates AND set equality
    assert len(got) == len(set(got))
    assert got == expected


# ---------------------------------------------------------------------------
# Count-min sketch: one-sided guarantee for EVERY key
# ---------------------------------------------------------------------------
@given(keys=st.lists(st.integers(0, 50), min_size=1, max_size=80))
@settings(**_SETTINGS)
def test_cms_estimate_never_undercounts_any_key(spark, keys):
    df = spark.createDataFrame(pd.DataFrame({"k": keys}).astype("int64"))
    exact = df.groupBy("k").agg(F.count("*").alias("exact_cnt"))
    rows_d = F.array(*[F.lit(i) for i in range(4)])
    cms = (
        exact.select("k", "exact_cnt", F.explode(rows_d).alias("hrow"))
        .groupBy("hrow", F.expr(_cms_bucket_sql("hrow", "k", "spark")).alias("bucket"))
        .agg(F.sum("exact_cnt").alias("cnt"))
    )
    probed = (
        exact.select("k", "exact_cnt", F.explode(rows_d).alias("hrow"))
        .withColumn("bucket", F.expr(_cms_bucket_sql("hrow", "k", "spark")))
        .join(cms, ["hrow", "bucket"])
        .groupBy("k", "exact_cnt")
        .agg(F.min("cnt").alias("est"))
        .collect()
    )
    assert len(probed) == len(set(keys))
    for r in probed:
        assert r.est >= r.exact_cnt, (r.k, r.est, r.exact_cnt)
    # total mass conservation per hash row
    total = sum(keys.count(k) for k in set(keys))
    per_row = (
        cms.groupBy("hrow").agg(F.sum("cnt").alias("mass")).collect()
    )
    assert all(r.mass == total for r in per_row)


# ---------------------------------------------------------------------------
# URL canonicalization: idempotence
# ---------------------------------------------------------------------------
def _canonicalize(spark, urls):
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    parts = df.select(
        "url",
        F.lower(F.regexp_extract("url", "^[hH][tT][tT][pP]://([^/:?]+)", 1)).alias(
            "host"
        ),
        F.regexp_replace(
            F.regexp_extract("url", "^[a-zA-Z]+://[^/]+([^?]*)", 1), "/$", ""
        ).alias("path"),
        F.regexp_extract("url", r"\?(.*)$", 1).alias("q"),
    )
    out = parts.withColumn(
        "kept",
        F.array_join(
            F.array_sort(
                F.expr(
                    "filter(split(q, '&'), x -> NOT startswith(x, 'utm_') AND x <> '')"
                )
            ),
            "&",
        ),
    ).select(
        F.concat(
            F.lit("http://"),
            F.col("host"),
            F.col("path"),
            F.when(F.col("kept") == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), F.col("kept"))
            ),
        ).alias("canonical")
    )
    return [r.canonical for r in out.collect()]


@given(
    host=st.text(alphabet="abcz", min_size=1, max_size=6),
    upper_host=st.booleans(),
    port80=st.booleans(),
    slash=st.booleans(),
    params=st.lists(
        st.sampled_from(["v=1", "a=2", "utm_x=9", "utm_source=f"]),
        max_size=3,
        unique=True,
    ),
)
@settings(**_SETTINGS)
def test_url_canonicalization_is_idempotent(spark, host, upper_host, port80, slash, params):
    h = f"www.{host}.example.com"
    url = "HTTP://" + (h.upper() if upper_host else h)
    if port80:
        url += ":80"
    url += "/p/1"
    if slash:
        url += "/"
    if params:
        url += "?" + "&".join(params)
    once = _canonicalize(spark, [url])[0]
    twice = _canonicalize(spark, [once])[0]
    assert once == twice
    assert "utm_" not in once and ":80" not in once
