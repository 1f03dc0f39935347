"""UDF/UDAF/UDTF queries — each runs Python-boundary code on the Spark
side and must byte-match a pure-SQL DuckDB oracle, proving the Arrow
exchange is semantics-preserving."""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.functions import normalize_text_udf, tokenize_udtf, weighted_avg_udaf
from river_spark.queries.relational import q
from river_spark.queries.tables import tbl


@q(
    "udf_normalize_text",
    oracle="""
    SELECT doc_id, trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
    FROM documents
    """,
    tags=("udf", "pandas_udf"),
)
def udf_normalize_text(spark, sf_dir):
    return tbl(spark, sf_dir, "documents").select(
        "doc_id", normalize_text_udf()("text").alias("norm")
    )


@q(
    "udaf_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS w_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("udf", "grouped_agg"),
)
def udaf_weighted_avg(spark, sf_dir):
    return (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(weighted_avg_udaf()("l_extendedprice", "l_quantity"), 4).alias("w_avg_price"))
    )


@q(
    "udtf_tokenize",
    oracle="""
    SELECT doc_id, i - 1 AS pos, t[i] AS token
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
          FROM documents WHERE doc_id < 20) s,
         UNNEST(generate_series(1, len(t))) AS g(i)
    """,
    tags=("udf", "udtf"),
)
def udtf_tokenize(spark, sf_dir):
    spark.udtf.register("rs_tokenize", tokenize_udtf())
    tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 20).createOrReplaceTempView("docs_tok")
    return spark.sql(
        # BIGINT pos: the oracle's generate_series arithmetic is BIGINT
        "SELECT doc_id, CAST(t.pos AS BIGINT) AS pos, t.token "
        "FROM docs_tok, LATERAL rs_tokenize(trim(text)) t"
    )
