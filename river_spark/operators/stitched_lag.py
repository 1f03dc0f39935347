"""Bucket-stitched lag: the scale-correct form of ``lag() OVER
(PARTITION BY key ORDER BY order)``.

A plain per-key lag window parallelizes only across keys — when the key
is coarse (5 event types over 100 TB of events), every row of a key
lands in ONE task and the window becomes the job's straggler. The
standard fix is to sub-partition by a time bucket and stitch the
boundaries:

1. lag WITHIN each (key, bucket) — parallelism is keys x buckets;
2. per (key, bucket), take the LAST row's value (one map-side-
   combinable ``max_by`` over the bucket's ordering tuple);
3. lag THAT tiny rollup by bucket order per key (handles EMPTY buckets:
   the previous row of the rollup is the previous NON-EMPTY bucket);
4. join the rollup back and ``coalesce``: rows after the first in
   their bucket use the in-bucket lag, each bucket's first row takes
   the previous bucket's last value.

The result is ROW-IDENTICAL to the plain window (property-tested in
tests/test_stitched_lag.py against ``F.lag`` itself), so queries keep
their plain-SQL oracles while running the stitched plan.

Cost model at 100 TB: one shuffle on (key, bucket) for the fine
window, one partial-aggregated rollup riding the same partitioning,
one keys-x-buckets-sized window + join back. The join's rollup side is
|keys x buckets| — e.g. 5 types x 3,650 days = 18k rows — a
stats-sized relation Spark broadcasts on its own (no hint; the
broadcast-discipline gate applies).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def stitched_lag(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    bucket: Column,
    out_col: str = "prev_value",
) -> DataFrame:
    """``df`` plus ``out_col`` = lag(value_col) over (PARTITION BY
    key_cols ORDER BY order_cols), computed with keys x buckets
    parallelism.

    ``bucket`` must be monotone non-decreasing in ``order_cols`` within
    each key (a time bucket over the leading order column — e.g.
    ``F.date_trunc('day', F.col('ts'))``); a non-monotone bucket breaks
    the boundary stitching and is the caller's bug.
    """
    keys = list(key_cols)
    order = list(order_cols)
    base = df.withColumn("_sl_bucket", bucket)

    fine = Window.partitionBy(*keys, "_sl_bucket").orderBy(*order)
    b = base.withColumn("_sl_in_bucket", F.lag(value_col).over(fine)).withColumn(
        "_sl_rn", F.row_number().over(fine)
    )

    # last value of each (key, bucket) under the full ordering tuple —
    # aggregated from the PRE-window frame so the (sorted) window
    # subtree isn't duplicated into the rollup branch. The value rides
    # inside a struct so a legitimately-NULL last value survives max_by
    # (a bare NULL value would be skipped, mis-carrying the
    # second-to-last value across the boundary).
    last = base.groupBy(*keys, "_sl_bucket").agg(
        F.expr(
            "max_by(struct({v} AS v), struct({o})).v".format(
                v=value_col, o=", ".join(order)
            )
        ).alias("_sl_last")
    )
    coarse = Window.partitionBy(*keys).orderBy("_sl_bucket")
    carry = last.select(
        *keys,
        "_sl_bucket",
        F.lag("_sl_last").over(coarse).alias("_sl_carry"),
    )

    # Stitch on ROW POSITION, not value nullness: a non-first row whose
    # true lag is a legitimate NULL must stay NULL rather than pick up
    # the previous bucket's carry (round-10 advice).
    out = (
        b.join(carry, keys + ["_sl_bucket"], "left")
        .withColumn(
            out_col,
            F.when(F.col("_sl_rn") == 1, F.col("_sl_carry")).otherwise(
                F.col("_sl_in_bucket")
            ),
        )
        .drop("_sl_bucket", "_sl_in_bucket", "_sl_carry", "_sl_rn")
    )
    return out


def stitched_row_number(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    bucket: Column,
    out_col: str = "rn",
) -> DataFrame:
    """``df`` plus ``out_col`` = row_number() over (PARTITION BY
    key_cols ORDER BY order_cols) as a BIGINT, computed with keys x
    buckets parallelism — the rank sibling of :func:`stitched_lag` for
    coarse keys (per-domain caps, deterministic shard positions,
    two-ended quality ranks).

    Shape: row_number WITHIN each (key, bucket), plus an EXCLUSIVE
    running count of earlier buckets from the keys x buckets rollup —
    a prefix sum of ones, but the rollup aggregates count(*) map-side
    instead of shipping a ones column.

    ``bucket`` must be monotone non-decreasing in ``order_cols`` within
    each key, exactly as in :func:`stitched_lag`."""
    keys = list(key_cols)
    order = list(order_cols)
    base = df.withColumn("_sr_bucket", bucket)

    fine = Window.partitionBy(*keys, "_sr_bucket").orderBy(*order)
    b = base.withColumn("_sr_in", F.row_number().over(fine))

    counts = base.groupBy(*keys, "_sr_bucket").agg(F.count("*").alias("_sr_cnt"))
    coarse = (
        Window.partitionBy(*keys)
        .orderBy("_sr_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = counts.select(
        *keys,
        "_sr_bucket",
        F.coalesce(F.sum("_sr_cnt").over(coarse), F.lit(0)).alias("_sr_before"),
    )

    out = (
        b.join(carry, keys + ["_sr_bucket"], "left")
        .withColumn(
            out_col,
            (F.col("_sr_before") + F.col("_sr_in")).cast("long"),
        )
        .drop("_sr_bucket", "_sr_in", "_sr_before")
    )
    return out


def stitched_prefix_sum(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str | Sequence[str],
    bucket: Column,
    out_col: str | Sequence[str] = "running_sum",
) -> DataFrame:
    """``df`` plus ``out_col`` = sum(value_col) over (PARTITION BY
    key_cols ORDER BY order_cols ROWS UNBOUNDED PRECEDING), computed
    with keys x buckets parallelism — the prefix-sum sibling of
    :func:`stitched_lag` for coarse keys (CUSUM, running balances).

    ``value_col``/``out_col`` may be LISTS of the same length: all the
    prefix sums then share ONE fine window, ONE rollup, and ONE carry
    window (e.g. the two empirical-CDF counters of a K-S test), instead
    of paying the three exchanges per column.

    Shape: (1) cumsum WITHIN each (key, bucket); (2) per-bucket totals
    (one map-side-combinable agg); (3) EXCLUSIVE running sum of the
    totals per key — a window over the tiny keys x buckets rollup;
    (4) join back and add the carry.

    NULL semantics match the plain window: sum ignores NULL values, and
    a row is NULL iff no non-null value precedes it in its key
    (coalesce over in-bucket+carry / in-bucket / carry).

    Exactness: integer-typed values regroup exactly. For doubles the
    stitched grouping can differ from the running order in the last
    bits — same class of reassociation the engines' own
    segment-tree-vs-running window implementations already exhibit;
    callers that need cross-engine stability round the OUTPUT (the
    ev_cusum_changepoint round-4 idiom), not the operator.

    ``bucket`` must be monotone non-decreasing in ``order_cols`` within
    each key, exactly as in :func:`stitched_lag`.
    """
    keys = list(key_cols)
    order = list(order_cols)
    values = [value_col] if isinstance(value_col, str) else list(value_col)
    outs = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(values) != len(outs):
        raise ValueError("value_col and out_col must have the same length")
    base = df.withColumn("_sp_bucket", bucket)

    fine = Window.partitionBy(*keys, "_sp_bucket").orderBy(*order)
    b = base
    for i, v in enumerate(values):
        b = b.withColumn(f"_sp_in_{i}", F.sum(v).over(fine))

    totals = base.groupBy(*keys, "_sp_bucket").agg(
        *[F.sum(v).alias(f"_sp_total_{i}") for i, v in enumerate(values)]
    )
    coarse = (
        Window.partitionBy(*keys)
        .orderBy("_sp_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = totals.select(
        *keys,
        "_sp_bucket",
        *[
            F.sum(f"_sp_total_{i}").over(coarse).alias(f"_sp_carry_{i}")
            for i in range(len(values))
        ],
    )

    out = b.join(carry, keys + ["_sp_bucket"], "left")
    drop = ["_sp_bucket"]
    for i, oc in enumerate(outs):
        out = out.withColumn(
            oc,
            F.coalesce(
                F.col(f"_sp_in_{i}") + F.col(f"_sp_carry_{i}"),
                F.col(f"_sp_in_{i}"),
                F.col(f"_sp_carry_{i}"),
            ),
        )
        drop += [f"_sp_in_{i}", f"_sp_carry_{i}"]
    return out.drop(*drop)
