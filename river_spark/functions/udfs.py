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
