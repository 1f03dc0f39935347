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

_K, _T, _SIDE = "__asof_k", "__asof_t", "__asof_side"


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
    key group. Left rows with no match keep NULLs (left-join semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    left_payload = [c for c in left.columns]
    # Right rows sort before left (rank 0) at equal ts for inclusive
    # semantics, after left (rank 2) for strict semantics.
    right_side_rank = 2 if strict else 0

    l_tagged = left.select(
        F.col(left_on).alias(_K),
        F.col(left_ts).alias(_T),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).alias(c) for c in right_cols],
    )
    r_tagged = right.select(
        F.col(right_on).alias(_K),
        F.col(right_ts).alias(_T),
        F.lit(right_side_rank).alias(_SIDE),
        *[F.lit(None).alias(c) for c in left_payload],
        *[F.col(c) for c in right_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        order = [F.col(_T).asc(), F.col(_SIDE).asc()]
    else:
        order = [F.col(_T).desc(), F.col(_SIDE).asc()]
    w = (
        Window.partitionBy(_K)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        _SIDE,
        *[F.col(c) for c in left_payload],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_cols],
    )
    return filled.filter(F.col(_SIDE) == 1).drop(_SIDE)
