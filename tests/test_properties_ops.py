"""Property-based checks for round-6 operators: randomized inputs
against independent in-process references (pandas / brute force).
Example counts stay small — every example runs Spark jobs."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),  # user
            st.integers(0, 50),  # ts offset
            st.one_of(st.none(), st.floats(-10, 10, allow_nan=False)),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_locf_matches_pandas_ffill(spark, rows):
    pdf = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "user_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "v": [r[2] for r in rows],
        }
    )
    df = spark.createDataFrame(pdf.astype({"v": "float64"}))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = (
        df.select(
            "event_id", F.last("v", ignorenulls=True).over(w).alias("filled")
        )
        .toPandas()
        .set_index("event_id")["filled"]
        .sort_index()
    )
    exp = (
        pdf.sort_values(["user_id", "ts", "event_id"])
        .groupby("user_id")["v"]
        .ffill()
        .reindex(pdf.index)
    )
    exp.index = pdf["event_id"]
    pd.testing.assert_series_equal(
        got, exp.sort_index(), check_names=False, check_dtype=False
    )


_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _jaccard(a: str, b: str, n: int = 3) -> float:
    def sh(t):
        toks = t.lower().split()
        k = max(len(toks) - n + 1, 1)
        return {" ".join(toks[i : i + n]) for i in range(k)}

    sa, sb = sh(a), sh(b)
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


@given(
    data=st.data(),
    n_corpus=st.integers(1, 4),
    n_bench=st.integers(1, 3),
)
@settings(**_SETTINGS)
def test_cross_corpus_matches_brute_force(spark, data, n_corpus, n_bench):
    """Brute-force parity at threshold 0.9, where the 16-band/64-hash
    geometry's miss probability is ~4e-8 per qualifying pair — the
    expectation is therefore exact, not merely likely, regardless of
    which examples hypothesis generates. Near-dup pairs are PLANTED
    (benchmark doc + one appended token: J = S/(S+1) >= 0.93 at >= 15
    tokens) because random draws essentially never reach 0.9."""
    from river_spark.queries.curation3 import cross_corpus_contamination

    doc = st.lists(st.sampled_from(_WORDS), min_size=15, max_size=25).map(" ".join)
    bench_rows = [(i, data.draw(doc)) for i in range(n_bench)]
    corpus_rows = []
    for i in range(n_corpus):
        if data.draw(st.booleans()):
            base = data.draw(st.sampled_from(bench_rows))[1]
            corpus_rows.append((100 + i, base + " tail"))
        else:
            corpus_rows.append((100 + i, data.draw(doc)))
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    bench = spark.createDataFrame(bench_rows, ["bench_id", "text"])
    got = {
        r["doc_id"]: r["bench_id"]
        for r in cross_corpus_contamination(
            corpus, bench, "doc_id", "bench_id", "text", threshold=0.9
        ).collect()
    }
    exp = {}
    for cid, ct in corpus_rows:
        best = None
        for bid, bt in sorted(bench_rows):
            j = round(_jaccard(ct, bt), 6)
            if _jaccard(ct, bt) >= 0.9 and (best is None or j > best[1]):
                best = (bid, j)
        if best:
            exp[cid] = best[0]
    assert got == exp


@given(
    vals=st.lists(st.floats(-100, 100, allow_nan=False), min_size=2, max_size=30)
)
@settings(**_SETTINGS)
def test_decimal_sum_is_exact(spark, vals):
    """DECIMAL aggregation must equal exact Fraction arithmetic after
    2-dp quantization, independent of partition order."""
    from decimal import Decimal

    q = [Decimal(str(round(v, 2))) for v in vals]
    df = spark.createDataFrame([(float(round(v, 2)),) for v in vals], ["x"])
    got = (
        df.repartition(8)
        .agg(F.sum(F.col("x").cast("decimal(18,2)")).alias("s"))
        .collect()[0]["s"]
    )
    assert got == sum(q)


@given(
    data=st.data(),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
)
@settings(**_SETTINGS)
def test_asof_matches_pandas_merge_asof(spark, data, direction):
    """asof_join against pandas merge_asof as an independent reference,
    randomized keys/timestamps — all three directions (round 13 added
    'nearest'; both references break equal-distance ties backward).
    Right timestamps are unique per key so tie-among-duplicates
    conventions (where the two references legitimately differ) can't
    muddy the comparison."""
    from river_spark.operators.asof import asof_join

    n_left = data.draw(st.integers(1, 15))
    left_rows = [
        (i, data.draw(st.integers(0, 2)), data.draw(st.integers(0, 50)))
        for i in range(n_left)
    ]
    right_rows = []
    for k in range(3):
        ts_set = data.draw(st.sets(st.integers(0, 50), max_size=8))
        right_rows += [(k, t, float(k * 100 + t)) for t in sorted(ts_set)]
    left = spark.createDataFrame(left_rows, ["row_id", "k", "t"])
    if right_rows:
        right = spark.createDataFrame(right_rows, ["k", "rt", "payload"])
    else:
        right = spark.createDataFrame([], "k long, rt long, payload double")
    got = {
        r["row_id"]: r["payload"]
        for r in asof_join(
            left, right, "k", "k", "t", "rt", ["payload"], direction=direction
        ).collect()
    }
    if not right_rows:
        assert got == {i: None for i, _, _ in left_rows}
        return
    lp = pd.DataFrame(left_rows, columns=["row_id", "k", "t"]).sort_values("t")
    rp = pd.DataFrame(right_rows, columns=["k", "rt", "payload"]).sort_values("rt")
    exp_df = pd.merge_asof(
        lp,
        rp,
        left_on="t",
        right_on="rt",
        by="k",
        direction=direction,
        allow_exact_matches=True,
    )
    exp = {
        int(r.row_id): (None if pd.isna(r.payload) else float(r.payload))
        for r in exp_df.itertuples()
    }
    assert got == exp


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=1, max_size=12).map(
            lambda toks: " ".join(toks)
        ),
        min_size=2,
        max_size=12,
    ),
    threshold=st.sampled_from([0.05, 0.3, 0.9]),
)
@settings(**_SETTINGS)
def test_ngram_jaccard_matches_brute_force(spark, docs, threshold):
    """The round-7 ngram_jaccard_pairs rewrite (map-side shingle sets,
    carried denominators, single-pass pair lambda) against an
    independent pure-python exhaustive Jaccard over the same truncated
    3-token shingle definition. Tiny vocab ('a'..'g') forces heavy
    shingle sharing, exercising the inverted index hard."""
    from river_spark.operators.dedup import ngram_jaccard_pairs

    def shingle_set(text):
        t = text.strip().lower().split()
        n = 3
        return {" ".join(t[i : i + n]) for i in range(max(len(t) - n, 0) + 1)}

    expected = {}
    sets = [shingle_set(d) for d in docs]
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            inter = len(sets[i] & sets[j])
            if inter == 0:
                continue
            jac = inter / len(sets[i] | sets[j])
            if jac >= threshold:
                expected[(i, j)] = jac

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], ["doc_id", "text"]
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=threshold
        ).collect()
    }
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert abs(got[k] - v) < 1e-12, (k, got[k], v)


@given(
    base=st.lists(
        st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
                 min_size=4, max_size=10).map(lambda t: " ".join(t)),
        min_size=2,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_minhash_pipeline_with_prefilter_finds_planted_dups(spark, base):
    """End-to-end three-stage minhash pipeline (banding -> estimate
    prefilter -> exact verify) on a corpus with planted exact duplicates:
    every planted pair must surface at Jaccard 1.0 — the estimate
    prefilter (margin 0.65) may only ever drop sub-threshold pairs."""
    from river_spark.operators.dedup import (
        estimate_filtered_candidates,
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
        shingles,
    )

    rows = [(i, d) for i, d in enumerate(base)]
    rows += [(100 + i, d) for i, d in enumerate(base)]  # exact twins
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = shingles(docs, "doc_id", "text", 3, hashed=True, distinct=False)
    sigs = minhash_signatures(sh, 64)
    cand = lsh_candidate_pairs(sigs, bands=16, sig_len=64)
    surv = estimate_filtered_candidates(sigs, cand, margin_est=0.65)
    ids = surv.select(F.explode(F.array("doc_a", "doc_b")).alias("doc_id")).distinct()
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs.join(ids, "doc_id", "left_semi"), "doc_id", "text", 3, threshold=0.9
        ).collect()
    }
    for i, d in enumerate(base):
        # identical text => Jaccard exactly 1.0; duplicate texts in `base`
        # itself may add more valid pairs, so check membership not equality
        assert pairs.get((i, 100 + i)) == 1.0, (i, pairs)
