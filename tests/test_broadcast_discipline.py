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

# Round-11: the pair moved from sf0.001/sf0.01 to sf0.01/sf0.1 because the
# fixtures keep `documents` and `embeddings` at 500 rows at BOTH of the
# smaller SFs (they only grow at sf0.1: 5,000 / 2,000) — so the old pair
# was vacuous for exactly the LLM-pipeline hazard class (document- and
# embedding-derived broadcast builds) the gate was built for.
SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_BIG = os.environ.get("SPARK_GRAFT_TEST_SF_BIG_DIR", "/root/testdata/sf0.1")

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
#
# The river_stream_* family runs REAL Structured Streaming drains inside
# fn(); Spark does not permit a broadcast build on a stream-stream join,
# so there is nothing for this gate to measure — re-executing each stream
# at two SFs tripled real streaming runs per suite for zero signal (and
# tripped the round-10 stop-vs-batch race). They get plan-only coverage
# instead: test_streaming_queries_have_no_broadcast_hint below statically
# verifies the family's source contains no F.broadcast / hint("broadcast").
_STREAM_EXEMPT_REASON = (
    "real streaming drain; stream-stream joins cannot carry a hinted "
    "broadcast build — statically verified hint-free below"
)
SLOW_EXEMPT: dict[str, str] = {
    name: _STREAM_EXEMPT_REASON
    for name in QUERIES
    if name.startswith("river_stream_")
}

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
    "decontam_ngram_overlap": (
        "same class: the broadcast side is the benchmark 3-shingle set — "
        "a fixed eval suite in production — but the fixture derives it as "
        "doc_id % 97 == 0, so it scales with SF here; the "
        "beyond-broadcast-size shape is decontam_bloom_prefilter, whose "
        "bitmap build is exactly fixed (dense 1042 words at every SF)"
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
        # AQE's empty-relation propagation deletes a join (and its hinted
        # broadcast build) when the OTHER side is empty at test SF — which
        # hid pipeline_curation_v2's corpus-proportional eval-shingle
        # broadcast behind an empty contamination set in round 10. Exclude
        # the rule so every hinted build materializes and gets measured.
        "spark.sql.adaptive.optimizer.excludedRules",
    ]
    targets = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.optimizer.excludedRules": (
            "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation"
        ),
    }
    old = {}
    for k in keys:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, targets[k])
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


def test_streaming_queries_have_no_broadcast_hint():
    """Plan-only coverage for the SLOW_EXEMPT river_stream_* family: their
    source (query fn + the streaming operators they call) must contain no
    forced broadcast of anything SF-scaling. Stream-stream joins cannot
    broadcast in Spark; the one allowed hint is the stream-STATIC join's
    `F.broadcast(nat)` — TPC-H nation is a CONSTANT 25-row dim at every
    SF, the canonical fixed-cardinality build. Any other hint appearing
    here should send the query back through the full growth gate instead
    of the exemption."""
    import inspect
    import re

    import river_spark.queries.river_ops as m1
    import river_spark.queries.river_ops2 as m2
    import river_spark.queries.river_ops3 as m3
    import river_spark.streaming.ops as sops

    allowed = re.compile(r"F\.broadcast\(nat\)")
    for mod in (m1, m2, m3, sops):
        src = inspect.getsource(mod)
        offending = [
            line.strip()
            for line in src.splitlines()
            if ("F.broadcast(" in line or 'hint("broadcast"' in line)
            and not allowed.search(line)
        ]
        assert not offending, (
            f"{mod.__name__} contains a non-allowlisted broadcast hint "
            f"{offending} — remove the river_stream_* SLOW_EXEMPT entries "
            f"and run the growth gate"
        )


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
