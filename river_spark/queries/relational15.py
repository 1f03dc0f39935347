"""Relational wave 15 (round 8, session 4): readability scoring and
graph link prediction.

- ``text_readability``: Flesch-Kincaid grade from exact integer word /
  sentence / vowel-group counts — the classic text-QA score, fully
  map-side.
- ``graph_common_neighbors``: common-neighbors / Jaccard link
  prediction over the co-purchase graph — "parts likely to be bought
  together next", the per-pair scoring face of the wedge join that
  triangle counting aggregates.

Bit-exactness rules follow tests/test_oracle.py: integer counts
everywhere; the score expressions are identical IEEE trees over exact
integers.

Reference parity: the reference engine (pbotros/river) has no
relational layer (its surface is the stream transport,
/root/reference/cpp/src/writer.cpp); these extend the analytics surface
the brief requires.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import tbl

_LP_MIN_SUP = 2  # co-purchase support floor, same as the graph family
_LP_TOPK = 20


# ---------------------------------------------------------------------------
# Flesch-Kincaid readability
# ---------------------------------------------------------------------------
@q(
    "text_readability",
    oracle="""
    WITH m AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_words,
               CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
        FROM documents)
    SELECT doc_id, n_words, n_sentences, n_syllables,
           0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
           + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
           - 15.59 AS fk_grade
    FROM m
    """,
    tags=("text", "quality", "readability"),
)
def text_readability(spark, sf_dir):
    """Flesch-Kincaid grade level per document — the standard
    readability gate in text-quality pipelines (too-low grade =
    listicle sludge, too-high = OCR garbage). The three inputs are
    exact integer counts from single regexes over the whole text
    (words = whitespace runs + 1, sentences = terminal-punctuation
    runs floored at 1, syllables = the vowel-group approximation
    counted over the full lowercased text in ONE regexp_count — not
    per word, which costs a lambda per token for the same number).
    The grade is the canonical 0.39·(words/sentences) +
    11.8·(syllables/words) − 15.59 over exact integers: identical
    IEEE tree in both engines, ungated by rounding.

    100 TB posture: zero shuffles — pure map-side expressions inside
    whole-stage codegen; composes into pipeline_curation_v2's fused
    gate plan for free."""
    t = tbl(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
    n_sent = F.greatest(
        F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1)
    ).cast("bigint")
    n_syll = F.regexp_count(F.lower(F.col("text")), F.lit("[aeiouy]+")).cast("bigint")
    m = t.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syll.alias("n_syllables"),
    )
    w, s, y = (F.col(c).cast("double") for c in ["n_words", "n_sentences", "n_syllables"])
    return m.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (F.lit(0.39) * (w / s) + F.lit(11.8) * (y / w) - F.lit(15.59)).alias("fk_grade"),
    )


# ---------------------------------------------------------------------------
# Common-neighbors link prediction
# ---------------------------------------------------------------------------
@q(
    "graph_common_neighbors",
    oracle=f"""
    WITH ob AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
        SELECT a.p AS pa, b.p AS pb
        FROM ob a JOIN ob b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p HAVING count(*) >= {_LP_MIN_SUP}
    ), und AS (
        SELECT pa AS u, pb AS v FROM e
        UNION ALL SELECT pb AS u, pa AS v FROM e
    ), deg AS (
        SELECT u, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY u
    ), wedge AS (
        SELECT x.v AS a, y.v AS b, CAST(count(*) AS BIGINT) AS common
        FROM und x JOIN und y ON x.u = y.u AND x.v < y.v
        GROUP BY x.v, y.v
    ), nonadj AS (
        SELECT w.a, w.b, w.common FROM wedge w
        WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = w.a AND e.pb = w.b)
    )
    SELECT n.a, n.b, n.common,
           n.common * 1.0 / (da.d + db.d - n.common) AS jaccard
    FROM nonadj n JOIN deg da ON da.u = n.a JOIN deg db ON db.u = n.b
    ORDER BY jaccard DESC, n.a, n.b LIMIT {_LP_TOPK}
    """,
    tags=("graph", "link_prediction"),
)
def graph_common_neighbors(spark, sf_dir):
    """Common-neighbors link prediction over the part co-purchase
    graph: for every NON-adjacent pair sharing at least one neighbor,
    the common-neighbor count and neighbor-set Jaccard — "parts likely
    to be bought together next". This is the per-pair scoring face of
    the same wedge equi-join triangle counting aggregates: wedges
    group to (a, b, common), existing edges are anti-joined away
    (a predicted link that already exists is not a prediction), and
    |N(a) ∪ N(b)| = deg(a) + deg(b) − common needs only the degree
    table — the union set is never materialized. Top-20 with a
    deterministic (jaccard desc, a, b) order; jaccard is one exact
    integer division.

    100 TB posture: wedge fan-out is the graph family's known
    quantity (bounded by the degree histogram this family ships —
    graph_degree_histogram IS the pre-flight check); the anti-join and
    degree joins are equi-joins on pair endpoints; top-k is
    TakeOrderedAndProject, never a full sort."""
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    ob = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = ob.alias("a"), ob.alias("b")
    e = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= _LP_MIN_SUP)
        .select("pa", "pb")
    )
    und = e.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionByName(
        e.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count("*").alias("d"))
    x, y = und.alias("x"), und.alias("y")
    wedge = (
        x.join(y, (F.col("x.u") == F.col("y.u")) & (F.col("x.v") < F.col("y.v")))
        .groupBy(F.col("x.v").alias("a"), F.col("y.v").alias("b"))
        .agg(F.count("*").alias("common"))
    )
    nonadj = wedge.join(
        e, (wedge.a == e.pa) & (wedge.b == e.pb), "left_anti"
    )
    da = deg.select(F.col("u").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("u").alias("b"), F.col("d").alias("db"))
    return (
        nonadj.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "common",
            (F.col("common") * 1.0 / (F.col("da") + F.col("db") - F.col("common"))).alias(
                "jaccard"
            ),
        )
        .orderBy(F.col("jaccard").desc(), "a", "b")
        .limit(_LP_TOPK)
    )
