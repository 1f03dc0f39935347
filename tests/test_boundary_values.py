"""Boundary-value cross-engine gate (round-9 verdict directive #2): the
sf-dir sweeps exercise realistic data, but the Wilson 1-ulp bug proved
that "same operation tree => bit-identical" breaks exactly at algebraic
boundaries (p in {0, 1}, n = 1, empty populations, constant series,
exact ties, zero vectors). This suite builds a deliberately adversarial
fixture dir and runs the ratio/sqrt/ln-bearing queries through BOTH
engines with the same bit-level comparison as tests/test_oracle.py.

Engine semantics this fixture is designed to hit (probed 2026-08-15):
- Spark runs ANSI mode: a raw double /0 THROWS; DuckDB yields NULL —
  every denominator that can reach 0 needs a shared guard.
- round(-0.0, 6) is +0.0 in Spark but -0.0 in DuckDB — any rounded
  output that can be a negative zero needs `+ 0.0` normalization.
- Spark's sequence(1, 0) DESCENDS ([1, 0]) where DuckDB's
  range(1, n) is empty — single-element arrays need explicit guards.
"""

import math
import struct

import duckdb
import numpy as np
import pandas as pd
import pytest

from river_spark.queries import QUERIES

# every query here reads only the tables the fixture writes
BOUNDARY_QUERIES = [
    "agg_conversion_wilson",
    "agg_ks_shard",
    "agg_entropy_mix",
    "agg_chi2_cells",
    "agg_value_bands",
    "ev_updown_streaks",
    "ev_gap_histogram",
    "ev_max_drawdown",
    "ev_autocorr_lag",
    "pipeline_token_budget_pack",
    "pipeline_mix_rebalance",
    "pipeline_shard_balance",
    "text_vocab_growth",
    "text_token_len_profile",
    "dedup_cluster_sizes",
    "pipeline_source_overlap",
    "emb_adjacent_cosine_hist",
    "emb_dim_variance",
    "text_bpe_pair_counts",
    "agg_moments_cents",
    "ev_fano_factor",
    "ev_gap_percentiles",
    "ev_hour_dow_heatmap",
    "text_hapax_ratio",
    "text_js_divergence",
    "pipeline_tokenizer_fertility",
    "agg_cohort_ltv_curve",
    "agg_new_vs_returning",
    "ev_user_regularity",
    "ev_dense_daily_grid",
    "dq_key_uniqueness",
    "pipeline_dedup_survivorship",
    "pipeline_dataset_delta",
    "ev_attribution_position_based",
    "agg_cramers_v",
    "pipeline_quota_sampler",
    "ev_wau_stickiness",
    "text_length_percentiles_by_lang",
    "agg_weekday_seasonality",
    # --- round-10 additions (directive: every new ratio/sqrt/ln query
    #     joins the gate in the same commit):
    "agg_theil_index",
    "agg_trimmed_mean",
    "agg_log2_value_histogram",
    "dq_null_profile",
    "dq_unreferenced_dims",
    "ev_burstiness",
    "ev_gap_entropy",
    "ev_dod_delta",
    "ev_power_user_share",
    "pipeline_dedup_rate_by_source",
    "pipeline_bucket_balance",
    "text_simpson_diversity",
    "text_compression_proxy",
    # REAL streaming drain against the adversarial events: same-ts ties,
    # single-event users, the 60s-clocked bot — session_window's state
    # store must reproduce the islands oracle on all of them
    "river_stream_session_window",
    # --- round-11 additions (same directive): dyadic EWMA division,
    #     sqrt-based temperature weights, hit-rate ratios, and PQ
    #     distance ties on the zero/identical/anti-parallel vectors
    "ev_ewma_daily",
    "pipeline_temperature_mix",
    "pipeline_blocklist_filter",
    "emb_pq_adc_search",
    "dedup_shingle_containment",
    "ev_markov_entropy_rate",
    "pipeline_pack_efficiency",
    "pipeline_pps_sample",
    # --- round-11 wave 30: rank-stat boundaries. The fixture's purchase
    #     arms are tiny and tie-free (users 8->A, 9->B: n_a=3, n_b=1,
    #     tie_cubes=0); the empty-arm branch of the z guard fires in
    #     test_mann_whitney_single_arm_guard below on a dedicated dir.
    #     The all-'en' doc corpus drives kappa's marginals to the
    #     near-degenerate edge. (agg_spearman_rho reads lineitem, which
    #     this fixture does not write — its constant-rank guard is
    #     covered by the sf sweeps and the shared guard pattern.)
    "ab_mann_whitney_u",
    "agg_cohens_kappa",
    # integer-division score quantization on 1-token / zero-stopword
    # docs (q_micro = 0, bin 0) and the 50%-budget crossing on tiny
    # per-source corpora (a single doc IS the knee)
    "pipeline_score_calibration",
    "pipeline_quality_knee",
    # single-token docs (one truncated shingle), the exact-dup pair
    # (band 20 = jaccard exactly 1.0), and the srcC solo doc
    "dedup_shingle_df_profile",
    "dedup_threshold_sweep",
    # one-class AUC guard (documents all-en corpus may produce a single
    # label class) and single-user / disjoint-audience type pairs
    "agg_auc_roc",
    "ev_audience_overlap",
    # same-ts click/purchase pairs (inclusive forward match, delta 0)
    # and users with clicks but no later purchase (NULL delta)
    "ev_asof_forward",
    # 1-doc sources (q1 = median = q3 = the doc; IQR 0 -> every fence
    # degenerate but no outliers), tie-heavy lengths
    "dq_length_iqr_outliers",
    # --- round-11 wave 31: on 4 orders a Poisson replicate draws all-zero
    #     weights with real probability (~e^-4 each) — the n_eff=0 nullif
    #     branch must yield NULL identically; KMV's tiny segments force
    #     the exact (k_n < K) branch and empty intersections force the
    #     LEFT JOIN coalesce(0); an arm with zero purchases drives the
    #     delta-method variance to sqrt(0); same-ts twap ties give dt=0
    #     weights and single-event (type, day) groups weight to day end.
    #     (dq_table_checksum reads lineitem, absent here — its NULL
    #     sentinel gets the dedicated planted test below.)
    "agg_bootstrap_ci",
    "agg_kmv_overlap",
    "agg_delta_method_ratio",
    "ev_twap",
    # REAL streaming KMV drain on the adversarial events: every segment
    # is far below K, so the streamed bottom-k must equal the exact
    # distinct sets (k_n < K branch) through multi-batch state merges
    "river_stream_kmv_distinct",
    # --- round-11 wave 32: the fixture's events all predate the CUPED
    #     cutoff, so Y is identically 0 — var(Y)=0 drives rho2 (and
    #     var_ratio) through the nullif guard in both engines; the
    #     incremental dedup's batch slice (doc_id%7=3) contains exactly
    #     the planted exact-dup doc 3, so the one emitted pair crosses
    #     the batch boundary
    "ab_cuped_adjusted",
    "pipeline_incremental_dedup",
    # single-user arms and types whose whole audience hashes to one arm
    # (n_b = 0) keep the chi2 denominator positive but drive the flag
    # comparison through extreme splits
    "ab_srm_check",
    # --- round-11 wave 33: the constant 3-day 'error' series drives
    #     Mann-Kendall's Var(S)=0 NULL guard (ties erase the variance
    #     exactly); single-day types vanish from the Theil-Sen pair set
    #     (zero pairs) rather than emitting a degenerate slope
    "agg_mann_kendall_trend",
    "agg_theil_sen_slope",
    # --- round-11 wave 34: tiny sources where one snapshot (or the
    #     overlap) is EMPTY exercise Chapman's built-in (m+1) guard —
    #     the estimator is defined by construction even at m = 0
    #     (graph_adamic_adar reads lineitem, absent here; its deg >= 2
    #     by-construction guard is pinned by the wedge definition and
    #     the sf sweeps).
    "agg_capture_recapture",
    # --- round-11 wave 35: the fixture's sparse days make most dyadic
    #     slots exact zeros — whole levels can have energy exactly 0,
    #     and the single-day 'error' series pushes all its mass through
    #     the zero-padding path
    "ev_haar_energy",
    # --- round-11 wave 36: all-pre-period events make every nonzero
    #     user a DOWN mover (post = 0), zero-value users drop as d = 0
    #     — the z denominator survives via the 3n(n+1)^2 all-tied floor
    "ab_wilcoxon_signed_rank",
    # single-day types have one block (n_blocks = 1) and the clocked
    # bot's constant values give zero block variance — both drive the
    # Gumbel fit to NULL through the shared guard
    "agg_gumbel_block_maxima",
    # --- round-12 wave 38: the fixture's tiny event set exercises the
    #     k-sample boundaries — event types with a single distinct
    #     value (whole-group ties) feed the tie-correction denominator,
    #     and the ordered fold keeps the one cross-group float sum
    #     bit-stable even at k = 1; all-converted tiers drive
    #     Cochran-Armitage's r = n NULL guard
    "agg_kruskal_wallis",
    "ab_cochran_armitage",
]

_FIXTURE_TABLES = ("customer", "orders", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def bdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("boundary_sf")

    # customer/orders: segments at p=1, p=0, and n=1 at both extremes;
    # a duplicate order checks the DISTINCT purchaser semantics.
    # round-10 columns: c_name hits the null-profile boundaries (NULL,
    # empty, whitespace-blank, duplicate values); c_nationkey gives
    # dq_unreferenced_dims a fully-referenced nation (0), a fully-
    # unreferenced one (1), and a half-and-half (2); c_acctbal ties +
    # negative + zero exercise the disc-quantile trim cuts.
    pd.DataFrame(
        {
            "c_custkey": [1, 2, 3, 4, 5, 6],
            "c_mktsegment": ["ALL", "ALL", "NONE", "NONE", "ONE1", "ONE0"],
            "c_name": [None, "", "  ", "x", "x", "y"],
            "c_nationkey": np.array([0, 0, 1, 1, 2, 2], dtype=np.int32),
            "c_acctbal": [100.0, 100.0, -5.25, 0.0, 42.42, 42.42],
        }
    ).to_parquet(d / "customer.parquet")
    # o_orderkey 1 is deliberately DUPLICATED: dq_key_uniqueness must
    # count it (n_dup_keys = 1), not just report clean tables
    # round-10 columns: o_totalprice 0.004 rounds to ZERO cents (the
    # theil ln-domain guard + the log2-histogram band-0 edge);
    # o_orderstatus/o_orderpriority carry NULL and whitespace blanks for
    # the null profile; o_orderdate includes a month-end (add_months
    # clamp) and a Monday (next_day strictly-after).
    pd.DataFrame(
        {
            "o_orderkey": [1, 1, 2, 3],
            "o_custkey": [1, 1, 2, 5],
            "o_totalprice": [100.0, 100.0, 0.004, 250.5],
            "o_orderstatus": [None, "", "F", "O"],
            "o_orderpriority": ["1-URGENT", "1-URGENT", None, "  "],
            "o_orderdate": pd.to_datetime(
                ["2024-01-31", "2024-01-31", "2024-01-01", "2024-12-31"]
            ).astype("datetime64[us]"),
        }
    ).to_parquet(d / "orders.parquet")

    # events:
    # - user 0: a single event (no lag pairs, drawdown exactly 0.0)
    # - user 1: strictly increasing values (zero drawdown, one long run)
    # - user 2: two events at the SAME timestamp (tie-ordering via id)
    # - users 8/16: purchase and view with IDENTICAL value sets -> KS D=0
    # - user 9 (shard 1): purchases only -> shard dropped by the KS guard
    # - event_type 'error': exactly 1/day over 3 days -> constant series,
    #   autocorr denominator 0 -> NULL in both engines
    # - value 0.0 rows -> cents 0, band 0
    rows = []

    def ev(eid, ts, uid, typ, val):
        rows.append((eid, np.datetime64(ts, "us"), uid, typ, val, "{}"))

    ev(1, "2024-01-01T00:00:00", 0, "click", 0.0)
    ev(2, "2024-01-01T01:00:00", 1, "click", 1.0)
    ev(3, "2024-01-01T02:00:00", 1, "click", 2.0)
    ev(4, "2024-01-01T03:00:00", 1, "click", 3.0)
    ev(5, "2024-01-01T04:00:00", 2, "click", 5.0)
    ev(6, "2024-01-01T04:00:00", 2, "click", 4.0)  # same ts, earlier id wins
    for i, v in enumerate([10.0, 20.0, 30.0]):
        ev(100 + i, f"2024-01-0{i + 1}T06:00:00", 8, "purchase", v)
        ev(200 + i, f"2024-01-0{i + 1}T07:00:00", 16, "view", v)
    ev(300, "2024-01-01T08:00:00", 9, "purchase", 7.0)
    for day in (1, 2, 3):
        ev(400 + day, f"2024-01-0{day}T09:00:00", 3, "error", 0.0)
    # user 7: a clocked bot — 13 events exactly 60 s apart, so its gap
    # variance is exactly 0 (Fano 0.0, too_regular = 1)
    for i in range(13):
        ev(500 + i, np.datetime64("2024-01-05T00:00:00") + np.timedelta64(60 * i, "s"),
           7, "view", 1.0)
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(d / "events.parquet")

    # documents: a single-token doc (sequence(1,0) hazard), a 70-char
    # token (the BPE _BPE_MAX_WORD cap), an exact-duplicate pair, and
    # enough normal docs that selections/overlaps are non-trivial.
    long_tok = "x" * 70
    docs = [
        (0, "hello", "en", "srcA"),
        (1, f"alpha beta {long_tok} gamma", "en", "srcA"),
        (2, "the quick brown fox jumps", "en", "srcA"),
        (3, "the quick brown fox jumps", "en", "srcB"),  # exact dup of 2
        (4, "lone", "en", "srcB"),
        (5, "alpha beta gamma delta epsilon", "en", "srcB"),
        # round 10: a source whose ONLY doc has ONE token — simpson's
        # N*(N-1) = 0 nullif boundary, and an empty bigram set for every
        # bigram-vocab consumer
        (6, "solo", "en", "srcC"),
    ]
    pd.DataFrame(
        [(i, t, lang, s, len(t)) for i, t, lang, s in docs],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(d / "documents.parquet")

    # embeddings (64-dim float32): identical adjacent pair (cos exactly
    # 1.0 -> band 10 edge), orthogonal pair (cos 0.0), anti-parallel
    # pair (cos -1.0 -> band -10), and a zero vector (guard must drop
    # both pairs that touch it).
    dim = 64
    e0 = np.zeros(dim, dtype=np.float32); e0[0] = 1.0
    e1 = e0.copy()                       # cos(e0, e1) = 1.0
    e2 = np.zeros(dim, dtype=np.float32); e2[1] = 2.0   # cos(e1, e2) = 0.0
    e3 = -e2                             # cos(e2, e3) = -1.0
    e4 = np.zeros(dim, dtype=np.float32)  # zero vector
    e5 = e0.copy()
    emb = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3, 4, 5],
            "embedding": [list(v) for v in (e0, e1, e2, e3, e4, e5)],
            "label": np.zeros(6, dtype=np.int32),
        }
    )
    emb.to_parquet(d / "embeddings.parquet")
    return str(d)


@pytest.fixture(scope="module")
def bddb(bdir):
    con = duckdb.connect()
    for t in _FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{bdir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", BOUNDARY_QUERIES)
def test_boundary_bit_exact(name, spark, bdir, bddb):
    q = QUERIES[name]
    got = q.fn(spark, bdir).toPandas()
    exp = bddb.execute(q.oracle).df()
    assert len(got) == len(exp), f"{name}: rows {len(got)} != oracle {len(exp)}"
    assert sorted(got.columns) == sorted(exp.columns)
    g, e = _canon(got), _canon(exp)
    for c in g.columns:
        for i, (a, b) in enumerate(zip(g[c].tolist(), e[c].tolist())):
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                assert struct.pack("<d", a) == struct.pack("<d", b), (
                    f"{name}.{c}[{i}]: {a!r} !≡ {b!r} (boundary bit drift)"
                )
            else:
                assert str(a) == str(b), f"{name}.{c}[{i}]: {a!r} != {b!r}"


def test_fixture_hits_the_boundaries(spark, bdir, bddb):
    """The fixture must actually contain the boundary cases this suite
    exists for — guard against the fixture silently drifting benign."""
    w = QUERIES["agg_conversion_wilson"].fn(spark, bdir).toPandas()
    by_seg = {r.segment: r for r in w.itertuples()}
    assert by_seg["ALL"].conversion_rate == 1.0 and by_seg["ALL"].wilson_hi == 1.0
    assert by_seg["NONE"].conversion_rate == 0.0 and by_seg["NONE"].wilson_lo == 0.0
    assert struct.pack("<d", by_seg["NONE"].wilson_lo) == struct.pack("<d", 0.0), (
        "wilson_lo at p=0 must be +0.0, not -0.0"
    )
    assert by_seg["ONE1"].n_customers == 1 and by_seg["ONE0"].n_customers == 1

    ks = QUERIES["agg_ks_shard"].fn(spark, bdir).toPandas()
    assert set(ks["shard"]) == {0}, "the one-population shard must be dropped"
    assert ks["ks_d"].iloc[0] == 0.0, "identical distributions => D exactly 0"

    ac = QUERIES["ev_autocorr_lag"].fn(spark, bdir).toPandas()
    err = ac[ac.event_type == "error"]
    assert len(err) == 1 and err["autocorr_r1"].isna().all(), (
        "constant daily series => NULL autocorrelation in both engines"
    )

    cos = QUERIES["emb_adjacent_cosine_hist"].fn(spark, bdir).toPandas()
    bands = dict(zip(cos["band"], cos["n"]))
    assert bands.get(10) == 1 and bands.get(0) == 1 and bands.get(-10) == 1
    assert sum(bands.values()) == 3, "pairs touching the zero vector must drop"

    reg = QUERIES["ev_user_regularity"].fn(spark, bdir).toPandas()
    assert set(reg["user_id"]) == {7}, "only the clocked user clears the floor"
    assert reg["fano_s"].iloc[0] == 0.0 and reg["too_regular"].iloc[0] == 1

    uniq = QUERIES["dq_key_uniqueness"].fn(spark, bdir).toPandas()
    by_key = {r.key_name: r for r in uniq.itertuples()}
    assert by_key["orders.o_orderkey"].n_dup_keys == 1, (
        "the planted duplicate order key must be counted"
    )
    assert by_key["events.event_id"].n_dup_keys == 0

    surv = QUERIES["pipeline_dedup_survivorship"].fn(spark, bdir).toPandas()
    assert len(surv) == 1 and surv["member_ids"].iloc[0] == "2,3", (
        "the identical-text pair must form one survivorship cluster"
    )
    assert surv["survivor_id"].iloc[0] == 2


def test_mann_whitney_single_arm_guard(spark, tmp_path):
    """Every purchase from ONE md5 arm: U is computable but the z
    variance is n_a*n_b/12*(...) = 0 — Spark must emit NULL through the
    guard (ANSI would throw on the raw /0) and DuckDB must agree."""
    # user 9 hashes to arm B (checked in the md5 rule); two purchases
    d = tmp_path / "single_arm"
    d.mkdir()
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01T00:00:00", "2024-01-01T01:00:00"]
            ).astype("datetime64[us]"),
            "user_id": [9, 9],
            "event_type": ["purchase", "purchase"],
            "value": [1.0, 2.0],
            "props": ["{}", "{}"],
        }
    )
    pdf.to_parquet(d / "events.parquet")

    got = QUERIES["ab_mann_whitney_u"].fn(spark, str(d)).toPandas()
    assert len(got) == 1
    assert got["n_a"].iloc[0] == 0 and got["n_b"].iloc[0] == 2
    assert got["u_a_x2"].iloc[0] == 0
    assert pd.isna(got["z_stat"].iloc[0]), "empty arm must yield NULL z"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    exp = con.execute(QUERIES["ab_mann_whitney_u"].oracle).df()
    assert pd.isna(exp["z_stat"].iloc[0]), "oracle must agree: NULL z"
    assert exp["n_b"].iloc[0] == 2


def _li(tmp_path, rows):
    d = tmp_path / "li_boundary"
    d.mkdir(exist_ok=True)
    pd.DataFrame(
        rows, columns=["l_orderkey", "l_partkey", "l_returnflag",
                       "l_quantity", "l_extendedprice"]
    ).astype({"l_orderkey": "int64", "l_partkey": "int64",
              "l_quantity": "float64", "l_extendedprice": "float64"}).to_parquet(
        d / "lineitem.parquet"
    )
    return str(d)


def test_spearman_constant_rank_guard(spark, tmp_path):
    """A group whose x (quantity) is CONSTANT has zero rank variance:
    rho must be NULL through the shared guard in both engines (Spark
    ANSI would throw on the raw /0)."""
    rows = [
        (1, 1, "K", 5.0, 100.0),   # group K: constant quantity
        (2, 2, "K", 5.0, 200.0),
        (3, 3, "K", 5.0, 300.0),
        (4, 4, "V", 1.0, 100.0),   # group V: perfectly monotone
        (5, 5, "V", 2.0, 200.0),
        (6, 6, "V", 3.0, 300.0),
    ]
    d = _li(tmp_path, rows)
    got = QUERIES["agg_spearman_rho"].fn(spark, d).toPandas().set_index("l_returnflag")
    assert pd.isna(got.loc["K", "spearman_rho"]), "constant x => NULL rho"
    # the double closed form lands within 1 ulp of 1.0 (cross-product
    # rounding); the CONTRACT is cross-engine bit-equality, checked below
    assert abs(got.loc["V", "spearman_rho"] - 1.0) < 1e-12

    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet')")
    exp = con.execute(QUERIES["agg_spearman_rho"].oracle).df().set_index("l_returnflag")
    assert pd.isna(exp.loc["K", "spearman_rho"])
    assert struct.pack("<d", got.loc["V", "spearman_rho"]) == struct.pack(
        "<d", exp.loc["V", "spearman_rho"]
    ), "both engines must produce the identical double"


def test_assortativity_constant_degree_guard(spark, tmp_path):
    """A pure cycle has every degree equal (2): zero degree variance,
    assortativity NULL through the guard in both engines. Edges reach
    the >= 2-order support floor by duplicating each co-purchase."""
    rows = []
    oid = 0
    # parts 1..4 in a cycle: (1,2),(2,3),(3,4),(4,1); each pair in TWO
    # orders so it clears the support floor
    for a, b in [(1, 2), (2, 3), (3, 4), (4, 1)]:
        for _ in range(2):
            oid += 1
            rows.append((oid, a, "N", 1.0, 10.0))
            rows.append((oid, b, "N", 1.0, 10.0))
    d = _li(tmp_path, rows)
    got = QUERIES["graph_assortativity"].fn(spark, d).toPandas()
    assert got["n_directed_edges"].iloc[0] == 8          # 4 undirected edges
    assert got["sum_deg"].iloc[0] == 16                  # every endpoint degree 2
    assert pd.isna(got["assortativity"].iloc[0]), "constant degree => NULL"

    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet')")
    exp = con.execute(QUERIES["graph_assortativity"].oracle).df()
    assert pd.isna(exp["assortativity"].iloc[0]) and exp["sum_deg"].iloc[0] == 16


def _full_li(path, rows):
    """Write a COMPLETE lineitem (all 11 columns, NULLs allowed) for the
    checksum tests — the shared _li helper writes only the 5 columns the
    rank statistics read."""
    path.mkdir(exist_ok=True)
    df = pd.DataFrame(
        rows,
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ],
    )
    df["l_orderkey"] = df["l_orderkey"].astype("Int64")
    df["l_partkey"] = df["l_partkey"].astype("Int64")
    df["l_suppkey"] = df["l_suppkey"].astype("Int64")
    df["l_linenumber"] = df["l_linenumber"].astype("Int32")
    # nullable Float64, NOT float64: a plain-float None becomes NaN, which
    # parquet stores as a VALUE — the sentinel test needs true NULLs
    for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
        df[c] = df[c].astype("Float64")
    df["l_shipdate"] = pd.to_datetime(df["l_shipdate"]).astype("datetime64[us]")
    df.to_parquet(path / "lineitem.parquet")
    return str(path)


def test_table_checksum_null_sentinel_and_replica_diff(spark, tmp_path):
    """The sf fixtures carry no NULL lineitem cells, so the checksum's
    per-column 'N' sentinel is untested there. Plant a row that is NULL
    in EVERY column and a second row NULL in a strict subset: both
    engines must render them to the same canonical hash (bit-equal
    checksum rows). Then flip one cell in a replica: the two checksum
    outputs must differ in at most 2 of 256 buckets (the row's old and
    new hash buckets) — the reconciliation property the query exists
    for."""
    base = [
        (None, None, None, None, None, None, None, None, None, None, None),
        (1, None, 3, 1, 5.0, None, 0.05, 0.01, "N", None, "2024-03-31"),
        (2, 7, 8, 2, 1.0, 100.0, 0.0, 0.0, "A", "F", "2024-01-01"),
        (3, 9, 10, 3, 2.0, 200.0, 0.1, 0.02, "R", "O", "2024-06-15"),
    ]
    d_a = _full_li(tmp_path / "replica_a", base)
    changed = [r for r in base]
    changed[3] = (3, 9, 10, 3, 2.0, 200.01, 0.1, 0.02, "R", "O", "2024-06-15")
    d_b = _full_li(tmp_path / "replica_b", changed)

    q = QUERIES["dq_table_checksum"]
    got_a = q.fn(spark, d_a).toPandas().set_index("bucket").sort_index()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d_a}/lineitem.parquet')"
    )
    exp_a = con.execute(q.oracle).df().set_index("bucket").sort_index()
    assert got_a.index.tolist() == exp_a.index.tolist()
    assert (got_a["n"] == exp_a["n"]).all()
    assert (got_a["checksum"] == exp_a["checksum"]).all(), (
        "NULL-bearing rows must hash identically in both engines"
    )
    assert int(got_a["n"].sum()) == 4

    got_b = q.fn(spark, d_b).toPandas().set_index("bucket").sort_index()
    merged = got_a.join(got_b, how="outer", lsuffix="_a", rsuffix="_b").fillna(-1)
    diff = merged[
        (merged["n_a"] != merged["n_b"]) | (merged["checksum_a"] != merged["checksum_b"])
    ]
    assert 1 <= len(diff) <= 2, (
        f"a single changed cell must move at most 2 buckets, got {len(diff)}"
    )
