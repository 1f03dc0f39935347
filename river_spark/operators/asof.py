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

    # The right payload travels as ONE struct: per-column
    # last(ignorenulls=True) would fill each column independently and
    # stitch values from DIFFERENT right rows into a row that never
    # existed whenever the true match carries a NULL payload column. The
    # struct itself is non-null for every right row (even all-NULL
    # payloads), so the whole matched row propagates together —
    # equi-ASOF semantics like DuckDB's ASOF JOIN.
    struct_type = right.select(*[F.col(c) for c in right_cols]).schema
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
        F.struct(*[F.col(c) for c in right_cols]).alias(_RS),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # Final tiebreak on the payload struct: equal (key, ts, side) right
    # rows otherwise attach nondeterministically across runs/retries.
    if direction == "backward":
        order = [F.col(_T).asc(), F.col(_SIDE).asc(), F.col(_RS).asc()]
    else:
        order = [F.col(_T).desc(), F.col(_SIDE).asc(), F.col(_RS).desc()]
    w = (
        Window.partitionBy(_K)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
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
