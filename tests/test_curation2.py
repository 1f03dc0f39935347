"""Semantic invariants for the second curation wave (curation2.py) and
the connected-components operator — properties the cross-engine oracle
can't state directly (closure correctness on handcrafted graphs, chunk
reconstruction, planted-PII hit guarantees, weight normalization)."""

import os

import pytest
from pyspark.sql import functions as F

from river_spark.operators.components import connected_components
from river_spark.queries.curation2 import (
    dedup_components,
    pipeline_domain_mix,
    text_chunk_sliding,
    text_pii_redact,
    text_repetition_filter,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _cc(spark, nodes, edges):
    n = spark.createDataFrame([(i,) for i in nodes], "id long")
    e = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(None, None)], "src long, dst long"
    )
    if not edges:
        e = e.where(F.col("src").isNotNull())
    out = connected_components(n, e)
    return {r["id"]: r["component"] for r in out.collect()}


def test_cc_chain_merges_end_to_end(spark):
    # a 12-node chain: single-hop propagation alone needs 11 rounds;
    # convergence inside max_rounds proves the compression hop works
    got = _cc(spark, range(12), [(i, i + 1) for i in range(11)])
    assert got == {i: 0 for i in range(12)}


def test_cc_isolated_nodes_are_singletons(spark):
    got = _cc(spark, [5, 9, 11], [])
    assert got == {5: 5, 9: 9, 11: 11}


def test_cc_two_components_and_bridge(spark):
    edges = [(1, 2), (2, 3), (10, 11)]
    got = _cc(spark, [1, 2, 3, 10, 11, 20], edges)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}
    # adding one bridge merges the two non-trivial components
    got2 = _cc(spark, [1, 2, 3, 10, 11, 20], edges + [(3, 10)])
    assert got2 == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1, 20: 20}


def test_cc_direction_insensitive(spark):
    # edges are undirected: reversing every pair changes nothing
    edges = [(4, 2), (2, 7), (9, 7)]
    fwd = _cc(spark, [2, 4, 7, 9], edges)
    rev = _cc(spark, [2, 4, 7, 9], [(b, a) for a, b in edges])
    assert fwd == rev == {2: 2, 4: 2, 7: 2, 9: 2}


def test_dedup_components_cluster_shape(spark):
    out = dedup_components(spark, SF_DIR).toPandas()
    # every component's canonical doc is its min member, exactly once
    for cid, g in out.groupby("component_id"):
        assert cid == g["doc_id"].min()
        assert g["is_canonical"].sum() == 1
        assert (g["comp_size"] == len(g)).all()
    # the three planted skip links (207->67, 307->167, 407->267) merge
    # block pairs: those six blocks form 3 components of 40
    sizes = sorted(out.drop_duplicates("component_id")["comp_size"])
    assert sizes.count(40) == 3


def test_chunk_reconstruction(spark):
    """Chunks at stride 150 with 200-char windows: the first 150 chars of
    every chunk plus the tail of the last reconstruct the document."""
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    chunks = text_chunk_sliding(spark, SF_DIR).toPandas()
    # verify against recomputed chunk md5s
    import hashlib

    for doc_id, g in chunks.groupby("doc_id"):
        text = docs[doc_id]
        g = g.sort_values("chunk_id")
        rebuilt = ""
        n = len(g)
        for _, row in g.iterrows():
            start = (row["chunk_id"] - 1) * 150
            piece = text[start : start + 200]
            assert hashlib.md5(piece.encode()).hexdigest() == row["chunk_md5"]
            assert len(piece) == row["chunk_len"]
            rebuilt = rebuilt[: start] + piece
        assert rebuilt == text, doc_id
        # every char position covered exactly by construction
        assert n >= 1


def test_pii_redaction_hits_planted_slice(spark):
    out = text_pii_redact(spark, SF_DIR).toPandas()
    planted = out[out["doc_id"] % 7 == 0]
    organic = out[out["doc_id"] % 7 != 0]
    assert (planted["n_emails"] >= 1).all()
    assert (planted["n_ips"] >= 1).all()
    # synthetic corpus has no organic PII
    assert (organic["n_emails"] == 0).all()
    assert (organic["n_ips"] == 0).all()


def test_domain_mix_weights_normalize(spark):
    out = pipeline_domain_mix(spark, SF_DIR).toPandas()
    assert abs(out["mix_weight"].sum() - 1.0) < 1e-4
    assert (out["mix_weight"] > 0).all()
    # sqrt temperature flattens: max/min weight ratio below raw token ratio
    t = out["n_tokens"]
    if t.max() > t.min():
        assert (
            out["mix_weight"].max() / out["mix_weight"].min()
            < float(t.max()) / float(t.min()) + 1e-9
        )


def test_repetition_filter_bounds(spark):
    out = text_repetition_filter(spark, SF_DIR).toPandas()
    assert (out["dup_token_frac"] >= 0).all() and (out["dup_token_frac"] <= 1).all()
    assert (out["top_bigram_frac"] >= 0).all()
    assert (out["top_bigram_count"] >= 0).all()


def test_cc_string_ids(spark):
    """Ids are any orderable type: string fingerprints cluster with
    lexicographic min as the canonical label (the sum-of-labels
    convergence shortcut this replaced crashed here under ANSI, and
    silently mislabeled with ANSI off)."""
    n = spark.createDataFrame([("b",), ("a",), ("c",), ("z",)], "id string")
    e = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    out = {r["id"]: r["component"] for r in connected_components(n, e).collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "z": "z"}


def test_cc_failure_paths_leave_no_cached_blocks(spark):
    """Both failure modes — non-convergence and a mid-loop job error —
    must free every checkpoint block they created."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    sc = spark.sparkContext._jsc.sc()
    it = sc.getPersistentRDDs().values().iterator()
    while it.hasNext():
        it.next().unpersist(False)
    # non-convergence: a 40-chain cannot converge in 1 round
    n = spark.createDataFrame([(i,) for i in range(40)], "id long")
    e = spark.createDataFrame([(i, i + 1) for i in range(39)], "src long, dst long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(n, e, max_rounds=1)
    assert sc.getPersistentRDDs().isEmpty()
    # mid-loop job failure: an edge endpoint whose label blows up the
    # neighbour-min join via a runtime error (ANSI division by zero)
    bad = n.select((F.lit(1) / (F.col("id") - F.col("id"))).alias("id"))
    with _pytest.raises(Exception):
        connected_components(bad, e).collect()
    assert sc.getPersistentRDDs().isEmpty()


def test_repetition_filter_keep_uses_both_signals(spark):
    out = text_repetition_filter(spark, SF_DIR).toPandas()
    expect = (out["dup_token_frac"] <= 0.9) & (out["top_bigram_frac"] <= 0.08)
    assert (out["keep"] == expect).all()
    # corpus exercises both branches of the verdict
    assert out["keep"].any() and (~out["keep"]).any()
    # every document gets a verdict — including any with no bigrams
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    assert len(out) == n_docs


def test_cc_random_graphs_match_union_find(spark):
    """Seeded random graphs cross-checked against a pure-Python
    union-find — an independent algorithm, so agreement validates the
    distributed fixpoint on shapes no handcrafted case anticipates."""
    import random

    rng = random.Random(20260814)
    for trial in range(5):
        n_nodes = rng.randint(2, 30)
        nodes = list(range(n_nodes))
        n_edges = rng.randint(0, n_nodes * 2)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
        ]
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {}
        for v in nodes:
            r = find(v)
            expected[v] = min(u for u in nodes if find(u) == r)
        got = _cc(spark, nodes, edges)
        assert got == expected, f"trial {trial}: n={n_nodes} edges={edges}"
