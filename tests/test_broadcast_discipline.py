"""Hinted-broadcast discipline gate (round-9 verdict directive #3).

A forced `F.broadcast(dim)` is only safe when the dim's cardinality is
genuinely FIXED (nation, region, 1-row scalar aggregates, K-row
codebooks, literal probe sets). A hint on an SF-scaling relation
(orders, customer, part, supplier, anything lineitem- or
document-derived) is a latent executor-OOM: correct and fast at sf0.1,
a multi-billion-row broadcast at 100 TB. A single-SF row cap cannot
tell those apart (orders at sf0.001 is only 1.5k rows), so this gate
measures GROWTH:

1. Auto-broadcast is disabled (static AND adaptive thresholds = -1),
   so every Broadcast*Join left in the plan is hint-forced.
2. Each hinted query runs at sf0.001 and sf0.01 (10x data) and the
   build-side exchange's runtime numOutputRows is read for every
   broadcast join.
3. Gate: worst build rows at 10x data must stay within
   GROWTH_TOL x (build rows at 1x) + SLACK — fixed-cardinality builds
   are flat; an SF-scaling build grows ~10x and fails. An absolute cap
   backstops pathological fixed sets.

Pre-fix `dq_referential_integrity` (forced broadcast of orders /
customer / part / supplier keys) fails this gate; post-fix (no hints →
no broadcast join survives with auto-broadcast off) it is skipped.
"""

import os

import pytest

from river_spark.queries import QUERIES
from river_spark.testing.planwalk import broadcast_join_builds

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_BIG = os.environ.get("SPARK_GRAFT_TEST_SF_BIG_DIR", "/root/testdata/sf0.01")

# 10x data may not grow a hinted build by more than this factor (+slack).
# Fixed-cardinality relations are exactly flat; the tolerance absorbs
# sampling jitter in limit-N / threshold-derived probe sets.
GROWTH_TOL = 2.0
SLACK = 64
# absolute backstop at test SF: no hinted build may exceed this even if
# flat (a "fixed" million-row codebook is still a bad broadcast).
ABS_CAP = 100_000

# Queries here intentionally run Python-side iteration or real streaming
# inside fn() and are exercised by dedicated tests; a second full run at
# two SFs with broadcasts disabled would dominate suite time without
# adding signal (their hinted builds are 1-row scalars / K-row codebooks
# pinned by test_plans.py). Keep this list SHORT and justified.
SLOW_EXEMPT: dict[str, str] = {}

# Hinted relations that are genuinely FIXED in production but synthesized
# as an SF-scaling slice in this testdata, so the growth check cannot see
# their real cardinality. They still execute (both SFs, broadcasts off —
# which keeps the union->SMJ planner repro of session.py covered) and
# still face the absolute cap; only the growth assert is waived, with the
# reason recorded here. Keep this list SHORT and justified.
PRODUCTION_FIXED = {
    "decontam_minhash_bench": (
        "the broadcast side is the held-out BENCHMARK shingle/band table "
        "— a fixed eval suite in production — but the fixture derives it "
        "as doc_id % 50 == 0, so it scales with SF here; the operator's "
        "broadcast_bench=False is the documented corpus-sized-side shape "
        "(operators/.. cross_corpus_contamination docstring)"
    ),
}


def _hinted(name, spark, sf):
    """Build the query df with auto-broadcast off; return (df, [builds])
    where builds is non-empty only for hint-forced broadcast joins."""
    df = QUERIES[name].fn(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "BroadcastExchange" not in plan:
        return df, False
    return df, True


@pytest.fixture(scope="module")
def no_auto_broadcast(spark):
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    old = {}
    for k in keys:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, "-1")
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _max_build(df):
    df.collect()
    rows = [r for _, r in broadcast_join_builds(df) if r is not None]
    return max(rows) if rows else None


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_hinted_broadcast_builds_fixed_cardinality(name, no_auto_broadcast):
    if name in SLOW_EXEMPT:
        pytest.skip(SLOW_EXEMPT[name])
    spark = no_auto_broadcast
    df_small, has_hint = _hinted(name, spark, SF_SMALL)
    if not has_hint:
        pytest.skip("no hinted broadcast in plan")
    small = _max_build(df_small)
    df_big, _ = _hinted(name, spark, SF_BIG)
    big = _max_build(df_big)
    if big is None or small is None:
        pytest.skip("broadcast join elided at runtime")
    assert big <= ABS_CAP, (
        f"{name}: hinted broadcast build is {big} rows at {SF_BIG} — over "
        f"the absolute cap {ABS_CAP}; this is not a broadcastable relation"
    )
    if name in PRODUCTION_FIXED:
        return
    assert big <= GROWTH_TOL * small + SLACK, (
        f"{name}: hinted broadcast build grew {small} -> {big} rows on 10x "
        f"data — the hinted relation scales with SF and will OOM executors "
        f"at 100x. Drop the hint (AQE picks broadcast at laptop scale, "
        f"SMJ/shuffled-hash at 100x) or hint a genuinely fixed relation."
    )
