"""Sweeping plan lint: every registry query's physical plan is screened
for scale anti-patterns — an accidental CartesianProduct /
BroadcastNestedLoopJoin (outside the queries that intend one) or a
row-at-a-time Python UDF (BatchEvalPython) would melt at 100 TB even
though the local answer is right."""

import os

import pytest

from river_spark.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# queries whose semantics legitimately need a broadcast cross/NL join
CROSS_OK = {
    "join_cross_small",     # intentional tiny cross join
    "emb_knn_cosine",       # 1-row broadcast query vector
    "q11_supplier_balance_share",  # broadcast scalar threshold
    "q15_top_supplier",     # broadcast scalar max
    "q22_idle_customers",   # broadcast scalar average
    "emb_cosine_dedup",     # bucket-width literal join
    "emb_ann_ivf",          # tiny query-row x centroid routing cross
    "text_tfidf_top_terms", # broadcast 1-row corpus doc count (N for idf)
    "text_unigram_logprob", # broadcast 1-row corpus token total
    "emb_cluster_assign",   # broadcast K-row centroid table (K=8)
    "agg_value_histogram",  # broadcast 1-row global [min, max] for binning
    "text_bm25_rank",       # broadcast 1-row corpus stats (N, avgdl)
    "text_bigram_logprob",  # broadcast 1-row vocabulary cardinality (V)
    "emb_ann_recall",       # brute-force side: 20 broadcast query rows
    "emb_semdedup",         # broadcast 8-row centroid table
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_scale_antipatterns(name, spark):
    df = QUERIES[name].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if name not in CROSS_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: NL join in plan"
    # row-at-a-time Python UDFs never allowed; Arrow-batched ones are fine
    assert "BatchEvalPython" not in plan, f"{name}: non-Arrow Python UDF in plan"
