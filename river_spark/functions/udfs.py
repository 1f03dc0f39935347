"""UDF / UDAF / UDTF surface (SURVEY §2 Part B "UDF/UDAF/UDTF" row).

Three flavors, all Arrow-batched (never row-at-a-time Python):

- ``normalize_text_udf()``  — scalar ``pandas_udf``: vectorized string
  normalization (the shape every custom scalar op should take);
- ``weighted_avg_udaf()``   — grouped-aggregate ``pandas_udf``: a custom
  aggregate Spark lacks natively;
- ``tokenize_udtf()``       — Python UDTF (Spark 4): one-to-many row
  expansion with positions.

Each is exercised by an oracle-checked registry query (queries/udfs.py):
the UDF path must produce byte-identical results to the equivalent SQL,
proving the Python boundary doesn't change semantics.

Exposed as lazy factories — the decorators parse DDL schemas, which
requires an active SparkSession, so construction happens on first use.
"""

import functools

import pandas as pd


@functools.cache
def normalize_text_udf():
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def _normalize(s: pd.Series) -> pd.Series:
        # Explicit ASCII whitespace class + space-only strip: Python's \s
        # and str.strip() are Unicode-aware while the RE2/SQL oracle's \s
        # and trim() are not — NBSP/U+2028 must normalize identically on
        # both sides of the parity gate.
        return (
            s.str.lower().str.replace(r"[\t\n\f\r ]+", " ", regex=True).str.strip(" ")
        )

    return _normalize


@functools.cache
def weighted_avg_udaf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _weighted_avg(value: pd.Series, weight: pd.Series) -> float:
        denom = weight.sum()
        return float((value * weight).sum() / denom) if denom else float("nan")

    return _weighted_avg


@functools.cache
def tokenize_udtf():
    from pyspark.sql.functions import udtf

    import re

    # RE2's \s (the oracle's regexp_split_to_array class) — ASCII only,
    # and split semantics that yield [''] for empty input, exactly like
    # regexp_split_to_array(''): str.split() would emit NO rows for an
    # empty/whitespace-only document while the oracle emits one.
    ws = re.compile(r"[\t\n\f\r ]+")

    @udtf(returnType="pos: int, token: string", useArrow=True)
    class _Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for pos, token in enumerate(ws.split(text)):
                yield (pos, token)

    return _Tokenize


@functools.cache
def clickstream_cogroup_fn():
    """Cogrouped ``applyInPandas`` body (FlatMapCoGroupsInPandas — the
    fourth Python-boundary flavor): per-user merge of two event streams.
    For every purchase, the number of strictly-earlier clicks and the
    value of the latest one (ties on ts broken by event_id, matching the
    oracle's ORDER BY cts DESC, cid DESC). Vectorized via searchsorted
    over the sorted click timestamps — no Python-level row loop."""
    import numpy as np

    def _merge(purchases: pd.DataFrame, clicks: pd.DataFrame) -> pd.DataFrame:
        # Empty-side guard: when every row of a cogroup shuffle partition
        # comes from ONE side (e.g. 32 post-shuffle partitions over a small
        # key space — exactly what AQE's parallelismFirst coalescing keeps
        # at local[32]), Spark hands the other side as a ZERO-COLUMN pandas
        # DataFrame, so any column access raises KeyError. A user with
        # purchases and no clicks must yield n_prior=0 / last=NULL (the
        # oracle's LEFT JOIN); a user with clicks and no purchases yields
        # no rows. Guard on .empty, which covers both the zero-column and
        # the schema-ful empty frame.
        if purchases.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "n_prior_clicks": pd.Series(dtype="int64"),
                    "last_click_value": pd.Series(dtype="float64"),
                }
            )
        if clicks.empty:
            clicks = pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "ts": pd.Series(dtype=purchases["ts"].dtype),
                    "event_id": pd.Series(dtype="int64"),
                    "value": pd.Series(dtype="float64"),
                }
            )
        c = clicks.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        p = purchases.reset_index(drop=True)
        cts = c["ts"].to_numpy()
        n_prior = np.searchsorted(cts, p["ts"].to_numpy(), side="left")
        lastv = np.full(len(p), np.nan)
        mask = n_prior > 0
        if len(c) and mask.any():
            lastv[mask] = c["value"].to_numpy()[n_prior[mask] - 1]
        return pd.DataFrame(
            {
                "event_id": p["event_id"].astype("int64"),
                "user_id": p["user_id"].astype("int64"),
                "n_prior_clicks": n_prior.astype("int64"),
                "last_click_value": lastv,
            }
        )

    return _merge


@functools.cache
def payload_stats_arrow_fn():
    """``mapInArrow`` body (the zero-copy Arrow-batch flavor — one level
    below mapInPandas: RecordBatch in, RecordBatch out, no pandas
    conversion): per-document byte statistics computed with pyarrow
    compute kernels. The oracle recomputes each statistic in SQL, so the
    Arrow path must byte-match the JVM expressions."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _stats(batches):
        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.binary_length(pc.cast(text, pa.binary())), pa.int64()),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(pc.count_substring(text, "a"), pa.int64()),
                ],
                names=["doc_id", "n_bytes", "n_chars", "n_a"],
            )

    return _stats
