"""Python UDTFs (Spark 4.0 @udtf): user-defined TABLE functions joined
LATERAL per input row. Exercised here as a TEST rather than a registry
query deliberately: a Python UDTF plans as BatchEvalPythonUDTF — a
row-at-a-time Python evaluation the registry's plan lint bans from the
100 TB hot path (tests/test_plan_lint.py). The registry's
`udtf_tokenize` covers the LATERAL-UDTF query SHAPE with JVM-side
explode; this suite pins that the Python surface itself works and
agrees with that JVM formulation bit-for-bit, so a user who accepts the
Python-eval cost for genuinely-imperative row expansion gets correct
semantics.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

SF_DIR = "/root/testdata/sf0.001"


@udtf(returnType="word: string, wlen: int")
class _Tokenize:
    def eval(self, text: str):
        for w in (text or "").split():
            yield w, len(w)


def test_python_udtf_matches_jvm_explode(spark):
    spark.udtf.register("py_tokenize", _Tokenize)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.select("doc_id", "text").createOrReplaceTempView("_udtf_docs")
    via_udtf = spark.sql(
        """
        SELECT d.doc_id, t.word, t.wlen
        FROM _udtf_docs d, LATERAL py_tokenize(d.text) t
        """
    )
    via_explode = (
        docs.select(
            "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .select("doc_id", "word", F.length("word").cast("int").alias("wlen"))
    )
    got = {tuple(r) for r in via_udtf.collect()}
    exp = {tuple(r) for r in via_explode.collect()}
    assert got and got == exp


def test_python_udtf_is_batch_eval_python(spark):
    """The reason UDTFs stay out of the registry: the plan carries a
    Python evaluation operator. Pinned so the trade-off stays visible —
    if a Spark version starts arrow-vectorizing UDTF eval, this
    assertion flags the reassessment."""
    spark.udtf.register("py_tokenize2", _Tokenize)
    spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    ).createOrReplaceTempView("_udtf_docs2")
    df = spark.sql(
        "SELECT t.* FROM _udtf_docs2 d, LATERAL py_tokenize2(d.text) t"
    )
    assert "BatchEvalPythonUDTF" in df._jdf.queryExecution().executedPlan().toString()
