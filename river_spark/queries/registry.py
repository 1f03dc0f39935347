"""Collects every query module into the driver-facing registry."""

from __future__ import annotations

from dataclasses import dataclass

# Importing the modules populates relational.QUERIES via the @q decorator.
import river_spark.queries.relational as _relational  # noqa: F401
import river_spark.queries.events as _events  # noqa: F401
import river_spark.queries.text as _text  # noqa: F401
import river_spark.queries.vectors as _vectors  # noqa: F401
import river_spark.queries.river_ops as _river_ops  # noqa: F401
import river_spark.queries.pipeline as _pipeline  # noqa: F401
import river_spark.queries.relational2 as _relational2  # noqa: F401
import river_spark.queries.udfs as _udfs  # noqa: F401
import river_spark.queries.scale_ops as _scale_ops  # noqa: F401
import river_spark.queries.relational3 as _relational3  # noqa: F401
import river_spark.queries.relational4 as _relational4  # noqa: F401
import river_spark.queries.pipeline_composite as _pipeline_composite  # noqa: F401
from river_spark.queries.relational import QUERIES as _RAW


@dataclass(frozen=True)
class Query:
    name: str
    fn: object
    oracle: str | None
    tags: tuple
    bench: bool


# Explicit registration priority. The correctness driver checks queries in
# registry order with a bounded budget (round 1 covered exactly the first 50
# registrations), so the front of this list is chosen for OPERATOR-FAMILY
# coverage: every query that had no driver row in CORRECTNESS_r01 comes
# first, followed by one representative per already-verified family. The
# remaining already-verified queries (green in CORRECTNESS_r01) trail.
_PRIORITY = [
    # river transport round-trip (A1/A2/A13/A20/A21 proof)
    "river_ingest_roundtrip",
    "river_system_columns",
    "river_sink_roundtrip",
    "river_compressed_roundtrip",
    "river_pruned_ingest",
    "river_resume_roundtrip",
    "river_stale_autoeof",
    "river_http_read",
    "river_catalog_scan",
    "river_cli_roundtrip",
    # TPC-H wave 2-4 (join/subquery/correlated coverage)
    "q2_min_unit_price_supplier",
    "q7_nation_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_supplier_balance_share",
    "q15_top_supplier",
    "q16_supplier_count",
    "q20_promotion_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    # UDF / UDAF / UDTF (Arrow-batched python path)
    "udf_normalize_text",
    "udaf_weighted_avg",
    "udtf_tokenize",
    # vectors / ANN
    "emb_knn_cosine",
    "emb_norms",
    "emb_centroid_norms",
    "emb_ann_lsh",
    "emb_ann_ivf",
    # dedup families
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "emb_cosine_dedup",
    # multimodal
    "mm_payload_metadata",
    "mm_decode_features",
    "mm_frame_sample",
    # scale patterns + composite pipeline
    "ev_rollup_cascade",
    "join_salted",
    "agg_approx_distinct",
    "pipeline_training_set",
    # remaining previously-unchecked relational coverage
    "fn_array_agg",
    "pivot_status_priority",
    "set_ops_all",
    "scalar_regex",
    "null_semantics",
    "null_ordering",
    "fn_map",
    "fn_json_struct",
    "win_range_frame",
    "win_value_functions",
    # one representative per family already green in CORRECTNESS_r01
    "q1_pricing_summary",
    "q3_shipping_priority",
    "win_topk_per_group",
    "set_ops",
    "ev_tumbling_window",
    "ev_asof_join",
    "ev_range_join",
    "dedup_exact",
    "text_token_stats",
]

QUERIES: dict[str, Query] = {}
for name, fn, oracle, tags, bench in _RAW:
    if name in QUERIES:
        raise ValueError(f"duplicate query name {name}")
    QUERIES[name] = Query(name, fn, oracle, tags, bench)

_missing = [n for n in _PRIORITY if n not in QUERIES]
if _missing:
    raise ValueError(f"priority list references unknown queries: {_missing}")
QUERIES = {
    **{n: QUERIES[n] for n in _PRIORITY},
    **{n: q for n, q in QUERIES.items() if n not in set(_PRIORITY)},
}


def get_queries():
    return {name: q.fn for name, q in QUERIES.items()}


def get_oracle_sql():
    return {name: q.oracle.strip() for name, q in QUERIES.items() if q.oracle is not None}


def bench_queries():
    return {name: q.fn for name, q in QUERIES.items() if q.bench}
