"""grouped_kth_smallest / grouped_lower_median must be value-identical
to the plain row_number-over-full-sort formulation — that equivalence is
what lets ev_mad_outliers run the distributed-selection plan while
keeping its plain-SQL oracle.

Edge cases a naive bucketing gets wrong:
- all values equal (degenerate span -> single bucket);
- heavy ties straddling what would be a bucket boundary (equal values
  must share a bucket, so the within-bucket rank offset stays exact);
- tiny groups (n < n_buckets);
- negative values and mixed-sign ranges;
- even/odd group sizes (lower median = rank (n+1)//2);
- NULL values excluded from both rank and count.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from river_spark.operators.selection import (
    grouped_kth_smallest,
    grouped_lower_median,
)


def _plain_lower_median(df):
    wv = Window.partitionBy("k").orderBy("v", "rid")
    wt = Window.partitionBy("k")
    ranked = df.filter(F.col("v").isNotNull()).select(
        "k",
        "v",
        F.row_number().over(wv).alias("rn"),
        F.count("*").over(wt).alias("n"),
    )
    return ranked.filter(F.col("rn") == ((F.col("n") + 1) / 2).cast("long")).select(
        "k", F.col("v").alias("median")
    )


def _assert_median_equal(spark, rows, n_buckets=8):
    df = spark.createDataFrame(rows, "k string, rid long, v double")
    got = sorted(
        grouped_lower_median(df, ["k"], "v", n_buckets=n_buckets).collect()
    )
    exp = sorted(_plain_lower_median(df).collect())
    assert got == exp


def test_handcrafted_edges(spark):
    rows = [
        # odd group: median is the middle value
        ("a", 1, 1.0),
        ("a", 2, 5.0),
        ("a", 3, 9.0),
        # even group: LOWER median (rank 2 of 4)
        ("b", 4, 1.0),
        ("b", 5, 2.0),
        ("b", 6, 3.0),
        ("b", 7, 4.0),
        # all-equal group (span 0 -> single bucket)
        ("c", 8, 7.0),
        ("c", 9, 7.0),
        ("c", 10, 7.0),
        # heavy ties around the median
        ("d", 11, 1.0),
        ("d", 12, 2.0),
        ("d", 13, 2.0),
        ("d", 14, 2.0),
        ("d", 15, 3.0),
        # negative + mixed-sign range
        ("e", 16, -10.0),
        ("e", 17, -1.0),
        ("e", 18, 4.0),
        # single row
        ("f", 19, 42.0),
        # NULLs excluded: median of (1, 3) is 1
        ("g", 20, 1.0),
        ("g", 21, None),
        ("g", 22, 3.0),
    ]
    _assert_median_equal(spark, rows, n_buckets=4)


def test_randomized_equivalence(spark):
    import random

    rng = random.Random(1127)
    rows = []
    rid = 0
    for k in "abcdefgh":
        n = rng.randint(1, 200)
        lo, hi = sorted((rng.uniform(-1000, 1000), rng.uniform(-1000, 1000)))
        for _ in range(n):
            rid += 1
            # mix continuous values with deliberate tie mass
            v = (
                float(rng.randint(int(lo), int(hi) + 1))
                if rng.random() < 0.4
                else rng.uniform(lo, hi)
            )
            rows.append((k, rid, v))
    for nb in (2, 16, 1024):
        _assert_median_equal(spark, rows, n_buckets=nb)


def test_arbitrary_k(spark):
    rows = [("a", i, float((i * 37) % 101)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "k string, rid long, v double")
    for kk in (1, 2, 50, 99, 100):
        got = grouped_kth_smallest(
            df, ["k"], "v", k=F.lit(kk).cast("long"), n_buckets=16
        ).collect()
        exp = sorted(r[2] for r in rows)[kk - 1]
        assert len(got) == 1 and got[0]["kth_value"] == exp, (kk, got)


def test_no_full_sort_on_raw_rows(spark):
    """The point of the operator: no rank window runs over the whole
    key — the only row_number is inside the located bucket, and the
    raw-row exchanges hash on (key, bucket)."""
    rows = [("a", i, float(i % 97)) for i in range(500)]
    df = spark.createDataFrame(rows, "k string, rid long, v double")
    out = grouped_lower_median(df, ["k"], "v", n_buckets=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_ks_vb" in plan, "value-bucket column missing from the plan"
    import re

    assert re.search(r"hashpartitioning\(k#\d+[^)]*_ks_vb", plan), (
        "count rollup lost the value bucket in its partitioning"
    )


def test_containment_planted_subdocument(spark):
    """A snippet quoted verbatim inside a much larger page must score
    containment 1.0 while its Jaccard stays small — the case a
    symmetric threshold misses (the reason ngram_containment_pairs
    exists)."""
    from river_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    snippet = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"word{i}" for i in range(200))
    rows = [
        (1, snippet),
        (2, filler + " " + snippet + " " + filler.replace("word", "tail")),
        (3, "totally unrelated text with its own tokens"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_small"], r["doc_big"]): r
        for r in ngram_containment_pairs(
            df, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    assert (1, 2) in got, got
    r = got[(1, 2)]
    assert r["containment"] == 1.0
    assert r["jaccard"] < 0.05, "the snippet must be invisible to Jaccard"
    # and the symmetric detector at a typical threshold indeed misses it
    jac = ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.05).collect()
    assert not any(
        {p["doc_a"], p["doc_b"]} == {1, 2} for p in jac
    ), "planted pair should be below the Jaccard threshold"
