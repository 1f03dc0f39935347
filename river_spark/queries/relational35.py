"""Relational wave 35 (round 11): multi-resolution time-series features.

``ev_haar_energy``: the unnormalized Haar wavelet decomposition of each
event type's daily cents series — per-level detail energy, the classic
O(n) multi-resolution fingerprint behind change detection, seasonality
screening, and series indexing/compression choices (which scales carry
the signal?). The 30-day series pads to 32 dyadic slots (empty days are
exact zeros); each level halves the series with one pair rollup:

    detail_j = s_{2j} - s_{2j+1}      (unnormalized Haar difference)
    smooth_j = s_{2j} + s_{2j+1}      (carried to the next level)
    energy(level) = sum_j detail_j^2

Everything is an exact BIGINT from the cents rollup up: padding is 0,
differences/sums/squares stay integral, so both engines agree
bit-for-bit with no rounding anywhere. Five levels (32 -> 1) mean five
grouped aggregations over halving key spaces.

100 TB posture: the one full scan is the (type, day) hash agg; the log2
cascade operates on calendar-bounded rollups (level k has #days/2^k
rows per type), each a map-side-combinable agg on (type, j div 2). At
ten years of days the deepest level still holds ~2 rows per type. At
true row counts the squared energies widen to DECIMAL(38), the standard
switch.

Reference parity: the reference engine (pbotros/river) has no
relational layer (its surface is the stream transport,
/root/reference/cpp/src/writer.cpp); this extends the analytics
surface the brief requires.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl

_LEVELS = 5  # 32 slots -> 16 -> 8 -> 4 -> 2 -> 1


def _haar_level_sql(k: int) -> str:
    """CTE text for level k (reads l{k-1}(event_type, j, s))."""
    return f"""
    l{k} AS (
        SELECT event_type, j // 2 AS j,
               CAST(sum(CASE WHEN j % 2 = 0 THEN s ELSE -s END) AS BIGINT) AS det,
               CAST(sum(s) AS BIGINT) AS s
        FROM l{k - 1} GROUP BY event_type, j // 2)"""


_HAAR_ORACLE = (
    """
    WITH daily AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                   AS BIGINT) AS d,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2),
    grid AS (
        SELECT tg.event_type, tg.j, CAST(coalesce(daily.c, 0) AS BIGINT) AS s
        FROM (SELECT t.event_type, g.j
              FROM (SELECT DISTINCT event_type FROM daily) t,
                   (SELECT unnest(generate_series(0, 31)) AS j) g) tg
        LEFT JOIN daily ON daily.event_type = tg.event_type
                       AND daily.d = tg.j),
    l0 AS (SELECT event_type, j, s FROM grid),"""
    + ",".join(_haar_level_sql(k) for k in range(1, _LEVELS + 1))
    + """
    SELECT event_type, level, CAST(sum(det * det) AS BIGINT) AS energy,
           CAST(count(*) AS BIGINT) AS n_coeffs
    FROM ("""
    + " UNION ALL ".join(
        f"SELECT event_type, CAST({k} AS BIGINT) AS level, det FROM l{k}"
        for k in range(1, _LEVELS + 1)
    )
    + """)
    GROUP BY event_type, level
    """
)


@q(
    "ev_haar_energy",
    oracle=_HAAR_ORACLE,
    tags=("events", "timeseries", "wavelet", "exact"),
)
def ev_haar_energy(spark, sf_dir):
    """Per-(event_type, level) Haar detail energy of the daily cents
    series — which time scales (2-day, 4-day, ... 32-day) carry the
    variation. Level 1 energy dominates for noisy/bursty types; a
    weekly cadence concentrates in levels 2-3; a monotone trend pushes
    mass to the deepest levels. The whole cascade is exact integer
    arithmetic (pad-with-zero dyadic grid, +/- pair rollups, squared
    sums), so the gate compares BIGINTs — no float ever appears."""
    daily = (
        events_tbl(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
            .cast("bigint")
            .alias("d"),
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("c"))
    )
    types = daily.select("event_type").distinct()
    slots = types.select(
        "event_type", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("j")
    ).select("event_type", F.col("j").cast("bigint").alias("j"))
    sl, dl = slots.alias("sl"), daily.alias("dl")
    level = sl.join(
        dl,
        (F.col("sl.event_type") == F.col("dl.event_type"))
        & (F.col("sl.j") == F.col("dl.d")),
        "left",
    ).select(
        F.col("sl.event_type").alias("event_type"),
        F.col("sl.j").alias("j"),
        F.coalesce(F.col("dl.c"), F.lit(0)).cast("bigint").alias("s"),
    )
    legs = []
    for k in range(1, _LEVELS + 1):
        level = level.groupBy(
            "event_type", F.expr("j div 2").alias("j2")
        ).agg(
            F.sum(
                F.when(F.col("j") % 2 == 0, F.col("s")).otherwise(-F.col("s"))
            ).alias("det"),
            F.sum("s").alias("s"),
        ).select(
            "event_type", F.col("j2").alias("j"), "det", "s"
        )
        legs.append(
            level.select(
                "event_type", F.lit(k).cast("bigint").alias("level"), "det"
            )
        )
    allc = legs[0]
    for leg in legs[1:]:
        allc = allc.unionByName(leg)
    return allc.groupBy("event_type", "level").agg(
        F.sum(F.col("det") * F.col("det")).alias("energy"),
        F.count("*").alias("n_coeffs"),
    )
