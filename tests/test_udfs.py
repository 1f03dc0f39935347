"""Python-boundary regression pins (beyond the oracle value gate).

The oracle suite exercises every query through ``toPandas()`` — a
collect-style action that does NOT column-prune. ``count()``-style
actions DO prune, and Catalyst's pruning through FlatMapCoGroupsInPandas
is broken when the two cogroup children share attribute IDs (both sides
filtered off the same memoized scan): the right side's pandas frame
arrives missing every column whose ID also binds on the left, and the
merge crashes with KeyError. The fix gives the clicks side its own read
plan (tables.tbl(..., fresh=True)); these tests pin the count() path so
the hazard cannot silently return.
"""

import pandas as pd

from river_spark.queries.registry import QUERIES


def test_cogroup_clickstream_count_path_executes(spark, sf_dir):
    # .count() is the pruning-sensitive action — this crashed with
    # KeyError 'ts' (worker-side) before the fresh-scan fix, at every SF
    # and every core count.
    df = QUERIES["udf_cogroup_clickstream"].fn(spark, sf_dir)
    n = df.count()
    assert n > 0
    # and the pruned action agrees with the collect path row-for-row
    assert n == len(df.collect())


def test_cogroup_merge_handles_schemaless_empty_sides():
    # Spark hands a ZERO-COLUMN pandas frame for a cogroup side with no
    # rows in the partition; the merge must treat it as the empty
    # relation, not crash on missing columns.
    from river_spark.functions import clickstream_cogroup_fn

    fn = clickstream_cogroup_fn()
    purchases = pd.DataFrame(
        {
            "user_id": pd.Series([7, 7], dtype="int64"),
            "event_id": pd.Series([100, 101], dtype="int64"),
            "ts": pd.Series([10, 20], dtype="int64"),
        }
    )
    out = fn(purchases, pd.DataFrame())  # no clicks at all for this user
    assert list(out["n_prior_clicks"]) == [0, 0]
    assert out["last_click_value"].isna().all()

    out2 = fn(pd.DataFrame(), purchases)  # no purchases: no output rows
    assert len(out2) == 0
    assert list(out2.columns) == [
        "event_id",
        "user_id",
        "n_prior_clicks",
        "last_click_value",
    ]
