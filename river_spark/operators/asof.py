"""As-of join — a composition of Spark built-ins (no UDF, no per-row work).

Spark has no ASOF JOIN. The classic scalable re-expression is the
union + ordered window trick:

1. tag left rows (probe) and right rows (reference) and union them on a
   common layout;
2. one window, partitioned by the join key, ordered by (ts, side) with
   the right side sorting first at equal timestamps (inclusive match);
3. ``last(value, ignorenulls=True)`` over the unbounded-preceding frame
   propagates the most recent right-side payload onto each left row;
4. keep only left rows.

Cost model at scale: ONE shuffle of (|L| + |R|) rows on the join key and
a per-partition sort — same shape as a sort-merge join, no skew blowup
from range cross-products, fully whole-stage-codegen. This is the plan
you want at 100 TB, unlike a per-row correlated subquery or an
inequality nested-loop join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_K, _T, _SIDE, _RS = "__asof_k", "__asof_t", "__asof_side", "__asof_rs"
_RT = "__asof_rt"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach ``right_cols`` from the right row with the
    greatest ``right_ts`` <= ``left_ts`` (direction='backward'; inclusive
    unless ``strict``) or smallest >= (direction='forward') within the same
    key group. direction='nearest' attaches whichever of the two is
    closer in time, ties to the backward match — computed in the SAME
    single shuffle: one ordered window pass fills backward (last over
    unbounded-preceding) and forward (first over unbounded-following)
    simultaneously, then a row-local comparison picks. Left rows with no
    match keep NULLs (left-join semantics).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if direction == "nearest" and strict:
        raise ValueError("strict is not defined for direction='nearest'")

    left_payload = [c for c in left.columns]
    # Right rows sort before left (rank 0) at equal ts for inclusive
    # semantics, after left (rank 2) for strict semantics.
    right_side_rank = 2 if strict else 0

    # The right payload travels as ONE struct: per-column
    # last(ignorenulls=True) would fill each column independently and
    # stitch values from DIFFERENT right rows into a row that never
    # existed whenever the true match carries a NULL payload column. The
    # struct itself is non-null for every right row (even all-NULL
    # payloads), so the whole matched row propagates together —
    # equi-ASOF semantics like DuckDB's ASOF JOIN.
    # direction='nearest' needs the matched row's timestamp for the
    # row-local closer-of-the-two comparison, so it rides the struct as
    # an internal extra field.
    struct_exprs = [F.col(c) for c in right_cols] + (
        [F.col(right_ts).alias(_RT)] if direction == "nearest" else []
    )
    struct_type = right.select(*struct_exprs).schema
    l_tagged = left.select(
        F.col(left_on).alias(_K),
        F.col(left_ts).alias(_T),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(struct_type).alias(_RS),
    )
    # A NULL join key never matches under equi-join semantics: dropping
    # NULL-key right rows means the NULL-key window partition holds only
    # left rows, which then correctly get no match.
    r_tagged = right.filter(F.col(right_on).isNotNull()).select(
        F.col(right_on).alias(_K),
        F.col(right_ts).alias(_T),
        F.lit(right_side_rank).alias(_SIDE),
        *[F.lit(None).alias(c) for c in left_payload],
        F.struct(*struct_exprs).alias(_RS),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # Final tiebreak on the payload struct: equal (key, ts, side) right
    # rows otherwise attach nondeterministically across runs/retries.
    if direction in ("backward", "nearest"):
        order = [F.col(_T).asc(), F.col(_SIDE).asc(), F.col(_RS).asc()]
    else:
        order = [F.col(_T).desc(), F.col(_SIDE).asc(), F.col(_RS).desc()]
    w = (
        Window.partitionBy(_K)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if direction == "nearest":
        # Both fills share ONE partitioning+sort: backward = last over
        # the preceding frame, forward = first over the following frame
        # (at equal ts the right row sorts BEFORE the left row, so the
        # ts-equal match lands in the backward fill with delta 0 and
        # wins the tie exactly as documented).
        wf = (
            Window.partitionBy(_K)
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        both = unioned.select(
            _SIDE,
            F.col(_T),
            *[F.col(c) for c in left_payload],
            F.last(_RS, ignorenulls=True).over(w).alias("_asof_b"),
            F.first(_RS, ignorenulls=True).over(wf).alias("_asof_f"),
        )
        # epoch-microsecond doubles compare exactly (|epoch us| < 2^53)
        ts_dtype = left.schema[left_ts].dataType
        rt_dtype = right.schema[right_ts].dataType
        lt = _ts_as_num(F.col(_T), ts_dtype)
        bt = _ts_as_num(F.col(f"_asof_b.{_RT}"), rt_dtype)
        ft = _ts_as_num(F.col(f"_asof_f.{_RT}"), rt_dtype)
        chosen = (
            F.when(F.col("_asof_b").isNull(), F.col("_asof_f"))
            .when(F.col("_asof_f").isNull(), F.col("_asof_b"))
            .when(lt - bt <= ft - lt, F.col("_asof_b"))
            .otherwise(F.col("_asof_f"))
        )
        return (
            both.filter(F.col(_SIDE) == 1)
            .withColumn(_RS, chosen)
            .select(
                *[F.col(c) for c in left_payload],
                *[F.col(f"{_RS}.{c}").alias(c) for c in right_cols],
            )
        )
    filled = unioned.select(
        _SIDE,
        *[F.col(c) for c in left_payload],
        F.last(_RS, ignorenulls=True).over(w).alias(_RS),
    )
    return (
        filled.filter(F.col(_SIDE) == 1)
        .select(
            *[F.col(c) for c in left_payload],
            *[F.col(f"{_RS}.{c}").alias(c) for c in right_cols],
        )
    )


def _ts_as_num(col, dtype):
    """Order-preserving numeric view of a timestamp-or-numeric column:
    timestamps become epoch-microsecond doubles (exact — |epoch us| of
    any civil date < 2^53), numerics pass through as double."""
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        return F.unix_micros(col.cast("timestamp")).cast("double")
    if isinstance(dtype, DateType):
        return F.unix_micros(col.cast("timestamp")).cast("double")
    return col.cast("double")
