"""operators/graph.pagerank — the iterate-to-convergence production
loop behind the unrolled graph_pagerank registry query. Verified
against an independent numpy power iteration and checked for the
invariants the query's 2-iteration form cannot exercise (convergence,
lineage truncation across many rounds, isolated-free undirected mass
conservation)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from river_spark.operators.graph import pagerank

EDGES = [
    (0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 5), (5, 3), (1, 5), (6, 0),
]


def _numpy_pagerank(edges, damping=0.85, iters=200):
    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    und = edges + [(b, a) for a, b in edges]
    deg = np.zeros(n)
    for a, _ in und:
        deg[idx[a]] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(iters):
        new = np.full(n, (1 - damping) / n)
        for a, b in und:
            new[idx[b]] += damping * pr[idx[a]] / deg[idx[a]]
        pr = new
    return {node: pr[idx[node]] for node in nodes}


def test_pagerank_converges_to_numpy_fixed_point(spark):
    edges = spark.createDataFrame(pd.DataFrame(EDGES, columns=["u", "v"]))
    got = {r.nid: r.pr for r in pagerank(edges, max_iter=60, tol=1e-10).collect()}
    exp = _numpy_pagerank(EDGES)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-6), k


def test_pagerank_mass_conserved_and_positive(spark):
    edges = spark.createDataFrame(pd.DataFrame(EDGES, columns=["u", "v"]))
    out = pagerank(edges, max_iter=30).agg(
        F.sum("pr").alias("mass"), F.min("pr").alias("lo")
    ).collect()[0]
    # undirected construction has no dangling mass: ranks sum to 1
    assert out["mass"] == pytest.approx(1.0, abs=1e-9)
    assert out["lo"] > 0


def test_pagerank_many_rounds_survive_lineage(spark):
    """30 uncapped iterations would produce a plan ~30 joins deep
    without checkpointing; with it, analysis stays flat and the loop
    completes quickly. A regression that drops localCheckpoint shows up
    here as a multi-minute optimizer stall or StackOverflow."""
    edges = spark.createDataFrame(pd.DataFrame(EDGES, columns=["u", "v"]))
    out = pagerank(edges, max_iter=30, tol=0.0, checkpoint_every=3)
    assert out.count() == 7


def test_pagerank_matches_unrolled_registry_query_shape(spark):
    """Two loop iterations == the registry query's unrolled r2 (same
    teleport/damping algebra), tying the operator to the oracle-gated
    plan."""
    from river_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    unrolled = {
        r.nid: r.pagerank
        for r in QUERIES["graph_pagerank"].fn(spark, sf).collect()
    }
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    ob = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    a, b = ob.alias("a"), ob.alias("b")
    e = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= 2)
        .select("u", "v")
    )
    got = {
        r.nid: round(r.pr, 12)
        for r in pagerank(e, max_iter=2, tol=0.0, checkpoint_every=100).collect()
    }
    assert set(got) == set(unrolled)
    for k in unrolled:
        assert got[k] == pytest.approx(unrolled[k], abs=1e-9), k


def test_pagerank_releases_superseded_checkpoints(spark):
    """Storage-leak regression (round-9 advice): every superseded rank
    checkpoint must be unpersisted once its delta agg has read it —
    only the LATEST checkpoint may stay pinned (its blocks are the sole
    copy of lineage-truncated data), so storage never accumulates one
    RDD per checkpoint round."""
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getRDDStorageInfo()
    edges = spark.createDataFrame(pd.DataFrame(EDGES, columns=["u", "v"]))
    result = pagerank(edges, max_iter=40, tol=0.0, checkpoint_every=2)
    result.count()  # materialize through the final checkpoint
    after = jsc.getRDDStorageInfo()
    # max_iter=40 / every=2 => ~20 checkpoints during the run; without
    # the release, they all linger here
    grown = len(after) - len(before)
    assert grown <= 2, (
        f"{grown} cached RDDs left behind — superseded checkpoints not released"
    )
