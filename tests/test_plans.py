"""Physical-plan quality gates — the 100 TB posture checks.

Each assertion encodes a property that decides whether a query survives a
1000-executor scale-up: filters pushed into the parquet scan, projections
pruned to the needed columns, small dimensions broadcast (no shuffle of
the fact table beyond its own agg), top-k as TakeOrderedAndProject (no
global sort), and hash aggregates running partial (map-side combine)
before the exchange."""

import os

import pytest

from river_spark.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def plan(spark, name):
    df = QUERIES[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(spark, name):
    df = QUERIES[name].fn(spark, SF_DIR)
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_q6_filter_pushdown_and_pruning(spark):
    p = formatted(spark, "q6_forecast_revenue")
    assert "PushedFilters" in p
    # date + discount + quantity predicates reach the scan
    assert "l_shipdate" in p.split("PushedFilters")[1].split("\n")[0]
    # projection pruned: the scan must not read join keys it doesn't need
    read_schema = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" in read_schema and "l_orderkey" not in read_schema


def test_ev_seek_pushdown(spark):
    p = formatted(spark, "ev_seek")
    pushed = p.split("PushedFilters")[1].split("\n")[0]
    assert "ts" in pushed and "GreaterThan" in pushed


def test_q3_broadcasts_dimensions(spark):
    p = plan(spark, "q3_shipping_priority")
    assert "BroadcastHashJoin" in p
    # top-10 must not globally sort
    assert "TakeOrderedAndProject" in p


def test_q5_all_dims_broadcast(spark):
    p = plan(spark, "q5_nation_volume")
    # five dimension joins: customer/supplier/nation/region broadcast;
    # only the lineitem⋈orders join may shuffle
    assert p.count("BroadcastHashJoin") >= 4
    assert p.count("SortMergeJoin") <= 1


def test_topk_global_no_full_sort(spark):
    p = plan(spark, "topk_global")
    assert "TakeOrderedAndProject" in p
    assert "Exchange rangepartitioning" not in p  # a global sort would do this


def test_ev_tail_top1(spark):
    p = plan(spark, "ev_tail")
    assert "TakeOrderedAndProject" in p


def test_q1_partial_aggregation(spark):
    p = plan(spark, "q1_pricing_summary")
    # two HashAggregates around one exchange = map-side partial agg
    assert p.count("HashAggregate") >= 2
    assert "partial_" in p


def test_q1_whole_stage_codegen(spark):
    # AQE reveals codegen only in the final (post-execution) plan, where
    # "*(n)" prefixes mark WholeStageCodegen stages
    df = QUERIES["q1_pricing_summary"].fn(spark, SF_DIR)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in p and "*(" in p


def test_asof_single_shuffle(spark):
    p = plan(spark, "ev_asof_join")
    # union + window = exactly one hashpartitioning exchange on the key,
    # never a join explosion
    assert "SortMergeJoin" not in p and "BroadcastNestedLoopJoin" not in p
    assert p.count("Exchange hashpartitioning") == 1


def test_emb_knn_broadcast_no_shuffle_topk(spark):
    p = plan(spark, "emb_knn_cosine")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p  # query row broadcast
    assert "TakeOrderedAndProject" in p


def test_semi_anti_join_strategies(spark):
    for name in ("join_semi", "join_anti"):
        p = plan(spark, name)
        assert "LeftSemi" in p or "LeftAnti" in p


def test_dedup_exact_single_shuffle(spark):
    p = plan(spark, "dedup_exact")
    assert p.count("Exchange hashpartitioning") == 1
    assert p.count("HashAggregate") >= 2  # partial + final


def test_composite_keeper_join_not_hint_broadcast(spark):
    # The dedup-keeper semi join is corpus-sized: a forced broadcast hint
    # OOMs the driver at scale. The optimized logical plan must carry no
    # user broadcast hint on it (AQE picking broadcast at tiny SF is fine).
    df = QUERIES["pipeline_training_set"].fn(spark, SF_DIR)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in optimized and "BROADCAST" not in optimized


def test_minhash_verify_is_candidate_restricted(spark):
    # The exact-verify stage must collect shingle sets only for candidate
    # docs (left-semi on candidate ids), never for the full corpus.
    df = QUERIES["dedup_minhash_lsh"].fn(spark, SF_DIR)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in optimized
