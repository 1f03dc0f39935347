"""Distributed exact order statistics for coarse keys.

``row_number() OVER (PARTITION BY key ORDER BY value)`` is the textbook
way to pick a per-group median, but on a coarse key (5 event types over
100 TB) it full-sorts each key's entire history in ONE task. The
scale-correct form is classic distributed selection:

1. one map-side-combinable pass for per-key (min, max, n);
2. value-range bucketing — ``floor((v - min) / span * B)`` is monotone
   non-decreasing in v (FP mul/div of positives are monotone), so
   bucket order IS value order and equal values always share a bucket;
3. per-(key, bucket) counts, then an EXCLUSIVE cumulative count over
   the tiny keys x B rollup locates the single bucket whose count
   straddles rank k;
4. rank only WITHIN that straddling bucket (expected n/B of the key's
   rows) offset by the rows before it.

Every shuffle is on (key, bucket); the per-key side tables (stats,
located bucket) are one row per key — fixed-cardinality broadcasts that
pass the broadcast-discipline gate. Worst case (all values equal) the
straddling bucket holds everything; production recursion — re-bucket
within the straddling bucket — divides by B per level, but a constant
value needs no selection at all, so one level suffices in practice.

The result is the EXACT k-th smallest (ties share a value, so any
tie-break yields the same kth VALUE) — unlike a percentile_approx swap,
the plain-SQL oracle keeps holding at every scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_order_statistics(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    ks: Sequence[tuple[str, Column]],
    n_buckets: int = 1024,
) -> DataFrame:
    """One row per key with MULTIPLE exact order statistics — each
    ``(out_col, k_expr)`` in ``ks`` yields a column holding the exact
    k-th smallest non-null ``value_col`` (1-indexed; ``k_expr`` is an
    expression over the per-key count ``_ks_n`` and must land in
    [1, n]).

    All the statistics share ONE stats pass, ONE bucketing, and ONE
    per-(key, bucket) count rollup; only the straddling-bucket
    candidate sets differ (one tiny located row per key per k). Asking
    for quartiles therefore costs the same two data passes as asking
    for the median — the reason dq_length_iqr_outliers is 3 scans, not
    14."""
    keys = list(key_cols)
    names = [n for n, _ in ks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate out_col in ks: {names}")
    rows = df.filter(F.col(value_col).isNotNull())

    stats = rows.groupBy(*keys).agg(
        F.min(value_col).alias("_ks_min"),
        F.max(value_col).alias("_ks_max"),
        F.count(value_col).alias("_ks_n"),
    )
    for name, k in ks:
        stats = stats.withColumn(f"_ks_k_{name}", k)

    span = F.col("_ks_max") - F.col("_ks_min")
    vb = (
        F.when(span == 0, F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_buckets - 1),
                F.floor(
                    (F.col(value_col) - F.col("_ks_min")) / span * n_buckets
                ),
            )
        )
        .cast("int")
    )
    b = rows.join(F.broadcast(stats), keys).withColumn("_ks_vb", vb)

    # carry every k through the rollup (constant within a key) rather
    # than re-joining stats, which would self-join the lineage
    counts = b.groupBy(*keys, "_ks_vb").agg(
        F.count("*").alias("_ks_cnt"),
        *[F.first(f"_ks_k_{n}").alias(f"_ks_k_{n}") for n in names],
    )
    before_w = (
        Window.partitionBy(*keys)
        .orderBy("_ks_vb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = counts.withColumn(
        "_ks_before", F.coalesce(F.sum("_ks_cnt").over(before_w), F.lit(0))
    )
    # one located row per (key, statistic): melt the per-k straddle
    # filters into a union over the tiny keys x buckets rollup
    located = None
    for name in names:
        kcol = F.col(f"_ks_k_{name}")
        one = cum.filter(
            (F.col("_ks_before") < kcol)
            & (kcol <= F.col("_ks_before") + F.col("_ks_cnt"))
        ).select(
            *keys,
            "_ks_vb",
            F.lit(name).alias("_ks_name"),
            (kcol - F.col("_ks_before")).alias("_ks_target_rn"),
        )
        located = one if located is None else located.unionByName(one)

    in_bucket_w = Window.partitionBy(*keys, "_ks_name").orderBy(value_col)
    picked = (
        b.select(*keys, "_ks_vb", value_col)
        .join(F.broadcast(located), keys + ["_ks_vb"])
        .withColumn("_ks_rn", F.row_number().over(in_bucket_w))
        .filter(F.col("_ks_rn") == F.col("_ks_target_rn"))
        .select(*keys, "_ks_name", F.col(value_col).alias("_ks_value"))
    )
    wide = picked.groupBy(*keys).agg(
        *[
            F.max(F.when(F.col("_ks_name") == n, F.col("_ks_value"))).alias(n)
            for n in names
        ]
    )
    return wide


def grouped_kth_smallest(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    k: Column | None = None,
    n_buckets: int = 1024,
    out_col: str = "kth_value",
) -> DataFrame:
    """One row per key: ``out_col`` = the exact k-th smallest non-null
    ``value_col`` in the key's group (1-indexed).

    ``k`` is an expression over the per-key count column ``_ks_n``
    (e.g. lower median ``((F.col("_ks_n") + 1) / 2).cast("long")`` —
    the default); it must land in [1, n]. Thin wrapper over
    :func:`grouped_order_statistics` with a single statistic.
    """
    if k is None:
        k = ((F.col("_ks_n") + 1) / 2).cast("long")
    return grouped_order_statistics(
        df, key_cols, value_col, [(out_col, k)], n_buckets=n_buckets
    )


def grouped_lower_median(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    n_buckets: int = 1024,
    out_col: str = "median",
) -> DataFrame:
    """Exact LOWER median per key (rank (n+1)//2) — a pure order
    statistic, zero interpolation, bit-identical to the
    row_number-picked median at every scale."""
    return grouped_kth_smallest(
        df, key_cols, value_col, k=None, n_buckets=n_buckets, out_col=out_col
    )
