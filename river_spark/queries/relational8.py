"""Relational wave 8 (round 8, session 3): graph, sketch, market-data
and spatial operators — the analytics families the earlier waves had not
yet touched, each in its scale-canonical Spark shape.

- ``graph_triangle_count``: degree-oriented triangle counting over the
  part co-purchase graph (the orientation trick that bounds wedge
  fan-out by sqrt(2m) instead of max-degree).
- ``agg_countmin_sketch``: a count-min sketch built entirely in SQL
  (d x w integer counter matrix) with its estimate-vs-exact guarantees
  gate-checked as integers.
- ``agg_weighted_median``: exact weighted median via a value-histogram
  pre-aggregation — the window runs over <=50 histogram rows per group,
  never over raw data.
- ``ev_candle_ohlc``: per-type hourly OHLC candles (the market-data
  rollup), open/close via one full-frame window, no sums of doubles.
- ``ev_sequence_pattern``: per-user behavioral regex over the ordered
  event string (the poor man's MATCH_RECOGNIZE).
- ``geo_grid_proximity``: grid-bucketed spatial self-join — the
  geohash-prefix pattern for "pairs within radius r" without an
  all-pairs product, on exact integer micro-coordinates.

Bit-exactness rules follow tests/test_oracle.py: integer outputs
everywhere possible; the only doubles are integer-ratio divisions
(bit-identical IEEE division) or raw min/max/first/last picks of stored
doubles (no order-sensitive float summation anywhere in this module).

Reference parity: the reference engine (pbotros/river) has no
relational layer — its surface is the stream transport
(/root/reference/cpp/src/writer.cpp, reader.cpp); these queries extend
the analytics surface the brief requires on top of that data model.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl, tbl

# ---------------------------------------------------------------------------
# Degree-oriented triangle counting
# ---------------------------------------------------------------------------
_TRI_MIN_SUP = 2  # a-priori edge support floor before graph construction


@q(
    "graph_triangle_count",
    oracle=f"""
    WITH ob AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e AS (
        SELECT a.p AS pa, b.p AS pb
        FROM ob a JOIN ob b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= {_TRI_MIN_SUP}),
    und AS (
        SELECT pa AS u, pb AS v FROM e
        UNION ALL SELECT pb AS u, pa AS v FROM e),
    deg AS (SELECT u AS nid, count(*) AS d FROM und GROUP BY 1),
    ori AS (
        SELECT und.u AS s, und.v AS t
        FROM und
        JOIN deg da ON da.nid = und.u
        JOIN deg db ON db.nid = und.v
        WHERE da.d < db.d OR (da.d = db.d AND und.u < und.v)),
    tri AS (
        SELECT count(*) AS n_tri
        FROM ori e1
        JOIN ori e2 ON e2.s = e1.s AND e2.t <> e1.t
        JOIN ori e3 ON e3.s = e1.t AND e3.t = e2.t),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(sum(d) // 2 AS BIGINT) AS n_edges,
               CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges
        FROM deg)
    SELECT s.n_nodes, s.n_edges, s.n_wedges,
           CAST(t.n_tri AS BIGINT) AS n_triangles,
           3.0 * t.n_tri / s.n_wedges AS clustering_coeff
    FROM stats s, tri t
    """,
    tags=("graph", "triangle", "scale"),
)
def graph_triangle_count(spark, sf_dir):
    """Triangle counting with degree orientation — the canonical
    distributed-graph primitive (clustering coefficient, community
    density, spam/fraud ring detection). The graph is part co-purchase:
    parts are adjacent when they appear together in >= 2 orders (the
    a-priori support floor that prunes noise edges BEFORE the graph is
    materialized). Every undirected edge is then oriented from its
    lower-(degree, id) endpoint to its higher one, wedges are pairs of
    out-edges from a common source, and a wedge is a triangle iff the
    oriented closing edge exists — each triangle is counted exactly once
    at its (degree, id)-minimal vertex.

    100 TB posture: orientation is THE scale trick — out-degree under
    degree-ordering is bounded by sqrt(2m) regardless of how skewed the
    raw degree distribution is, so the wedge join's fan-out per key is
    capped (a celebrity node with degree 10^7 would otherwise emit 10^14
    wedges). All three legs are equi-joins that co-partition on the
    wedge source/target keys; `deg` is |V|-sized — graph-scaling, so
    unhinted (AQE broadcasts while it fits). The output is scale-free
    (one stats row)."""
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    ob = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    a, b = ob.alias("a"), ob.alias("b")
    e = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= _TRI_MIN_SUP)
        .select("pa", "pb")
    )
    und = e.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionByName(
        e.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    deg = und.groupBy(F.col("u").alias("nid")).agg(F.count("*").alias("d"))
    ori = (
        und.join(deg.select(F.col("nid").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("nid").alias("v"), F.col("d").alias("dv")), "v")
        .filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select(F.col("u").alias("s"), F.col("v").alias("t"))
    )
    e1, e2 = ori.alias("e1"), ori.alias("e2")
    wedges = e1.join(
        e2, (F.col("e2.s") == F.col("e1.s")) & (F.col("e2.t") != F.col("e1.t"))
    ).select(F.col("e1.s").alias("wa"), F.col("e1.t").alias("wb"), F.col("e2.t").alias("wc"))
    closing = ori.select(F.col("s").alias("wb"), F.col("t").alias("wc"))
    n_tri = wedges.join(closing, ["wb", "wc"]).agg(F.count("*").alias("n_tri"))
    stats = deg.agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.expr("sum(d) div 2").cast("long").alias("n_edges"),
        F.expr("sum((d * (d - 1)) div 2)").cast("long").alias("n_wedges"),
    )
    # 1-row x 1-row combine: a broadcast cross of two global aggregates
    # (CROSS_OK bound 1 in tests/test_plan_lint.py, like q15/agg_value_
    # histogram's scalar broadcasts).
    return stats.crossJoin(F.broadcast(n_tri)).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        F.col("n_tri").cast("long").alias("n_triangles"),
        (F.lit(3.0) * F.col("n_tri") / F.col("n_wedges")).alias("clustering_coeff"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch in pure SQL
# ---------------------------------------------------------------------------
_CMS_D = 4  # hash rows
_CMS_W = 256  # counters per row
_CMS_TOPK = 20


def _cms_bucket_sql(row: str, key: str, dialect: str) -> str:
    """md5-slice bucket in [0, _CMS_W) for hash row ``row`` over int
    column ``key``: ONE md5 per key, hash row i reads hex slice
    [1+8i, 8] — 4 independent-enough hash rows for the price of one
    digest (at scale this is xxhash64(key, seed_i); md5 keeps the
    oracle exact). ``row`` may be a column reference."""
    if dialect == "spark":
        return (
            f"pmod(cast(conv(substring(md5(cast({key} as string)), "
            f"1 + 8 * {row}, 8), 16, 10) as bigint), {_CMS_W})"
        )
    return (
        f"(('0x' || substr(md5(CAST({key} AS VARCHAR)), "
        f"1 + 8 * {row}, 8))::BIGINT % {_CMS_W})"
    )


@q(
    "agg_countmin_sketch",
    oracle=f"""
    WITH rows_d AS (SELECT unnest(range({_CMS_D})) AS hrow),
    exact AS (
        SELECT l_suppkey, count(*) AS exact_cnt FROM lineitem GROUP BY 1),
    cms AS (
        SELECT hrow, {_cms_bucket_sql('hrow', 'l_suppkey', 'duckdb')} AS bucket,
               sum(exact_cnt) AS cnt
        FROM exact, rows_d GROUP BY 1, 2),
    probe AS (
        SELECT l_suppkey, exact_cnt FROM exact
        ORDER BY exact_cnt DESC, l_suppkey LIMIT {_CMS_TOPK}),
    est AS (
        SELECT p.l_suppkey, p.exact_cnt, min(c.cnt) AS cms_est
        FROM probe p, rows_d r
        JOIN cms c ON c.hrow = r.hrow
        WHERE c.bucket = {_cms_bucket_sql('r.hrow', 'p.l_suppkey', 'duckdb')}
        GROUP BY 1, 2)
    SELECT l_suppkey, CAST(exact_cnt AS BIGINT) AS exact_cnt,
           CAST(cms_est AS BIGINT) AS cms_est,
           CAST(cms_est - exact_cnt AS BIGINT) AS overcount,
           CAST(CASE WHEN cms_est >= exact_cnt THEN 1 ELSE 0 END AS BIGINT)
               AS lower_bound_ok
    FROM est
    """,
    tags=("sketch", "cms", "scale"),
    bench=True,
)
def agg_countmin_sketch(spark, sf_dir):
    """Count-min sketch built entirely from relational operators: the
    d x w counter matrix is one hash aggregation over (hash_row,
    md5_bucket) — {_CMS_D} x {_CMS_W} = 1024 integer counters summarizing
    the whole l_suppkey frequency distribution in constant space. The
    probe side estimates each key's count as min over its d counters and
    gate-checks the sketch's one-sided guarantee (est >= exact, the
    `lower_bound_ok` flag) plus the actual overcount as integers — a
    hashing or merge regression flips a bit through the driver's
    value-hash. Unlike Spark's builtin `count_min_sketch` aggregate
    (whose binary blob SQL cannot probe), this formulation keeps the
    sketch queryable, mergeable (counters add), and oracle-replayable.

    100 TB posture: the sketch build is a map-side-combinable hash agg
    whose output is 1024 rows NO MATTER the input volume — this is the
    precompute-small/probe-cheap pattern for frequency queries over
    streams too hot to index. Two build shapes exist: when a per-key
    groupBy is affordable (here — it is computed anyway as ground
    truth), the sketch aggregates the VOCABULARY-sized count table (one
    md5 per key, explode x d over |keys| rows, exchange reuse shares
    the scan); when keys are too hot to group, the same expression runs
    directly on the raw stream and the d x w partial agg caps what any
    mapper ships at d*w rows. The probe join's sketch side is
    capacity-bounded at d*w rows, so AQE broadcasts it unhinted (a
    forced hint would trip the growth lint while the sketch is still
    sparse at tiny SF). All four hash rows slice ONE digest — hashing
    cost is per key, not per (key, row)."""
    li = tbl(spark, sf_dir, "lineitem").select("l_suppkey")
    rows_d = F.array(*[F.lit(i) for i in range(_CMS_D)])
    exact = li.groupBy("l_suppkey").agg(F.count("*").alias("exact_cnt"))
    cms = (
        exact.select("l_suppkey", "exact_cnt", F.explode(rows_d).alias("hrow"))
        .groupBy(
            "hrow",
            F.expr(_cms_bucket_sql("hrow", "l_suppkey", "spark")).alias("bucket"),
        )
        .agg(F.sum("exact_cnt").alias("cnt"))
    )
    probe = exact.orderBy(F.desc("exact_cnt"), "l_suppkey").limit(_CMS_TOPK)
    probed = (
        probe.select("l_suppkey", "exact_cnt", F.explode(rows_d).alias("hrow"))
        .withColumn("bucket", F.expr(_cms_bucket_sql("hrow", "l_suppkey", "spark")))
        .join(cms, ["hrow", "bucket"])
        .groupBy("l_suppkey", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return probed.select(
        "l_suppkey",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
        (F.col("cms_est") >= F.col("exact_cnt")).cast("long").alias("lower_bound_ok"),
    )


# ---------------------------------------------------------------------------
# Exact weighted median via value histogram
# ---------------------------------------------------------------------------
@q(
    "agg_weighted_median",
    oracle="""
    WITH hist AS (
        SELECT l_returnflag, l_linestatus,
               CAST(round(l_quantity) AS BIGINT) AS qty,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS w
        FROM lineitem GROUP BY 1, 2, 3),
    cum AS (
        SELECT l_returnflag, l_linestatus, qty, w,
               sum(w) OVER (PARTITION BY l_returnflag, l_linestatus
                            ORDER BY qty) AS cw,
               sum(w) OVER (PARTITION BY l_returnflag, l_linestatus) AS tw
        FROM hist)
    SELECT l_returnflag, l_linestatus,
           CAST(min(CASE WHEN 2 * cw >= tw THEN qty END) AS BIGINT)
               AS weighted_median_qty,
           CAST(min(tw) AS BIGINT) AS total_weight,
           CAST(count(*) AS BIGINT) AS n_distinct_values
    FROM cum GROUP BY 1, 2
    """,
    tags=("agg", "median", "scale"),
)
def agg_weighted_median(spark, sf_dir):
    """Exact weighted median (quantity weighted by price cents) per
    (returnflag, linestatus): the value domain is aggregated into a
    per-group weight histogram FIRST, then the median is read off the
    histogram's running weight — min value whose cumulative weight
    reaches half the total. Everything is integer arithmetic (whole
    quantities, price cents), so the result is bit-exact.

    100 TB posture: this is how you take an exact weighted quantile at
    scale — the raw-data pass is a pure hash aggregation (map-side
    partials, shuffle moves groups x |value domain| rows, here <= 50 per
    group), and the ordered window runs over the tiny histogram, never
    over the event stream. Contrast with percentile_disc over raw rows,
    which must shuffle and sort the full dataset per group (the
    single-reducer trap agg_percentile's posture notes)."""
    hist = (
        tbl(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            "l_linestatus",
            F.round("l_quantity").cast("long").alias("qty"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("l_returnflag", "l_linestatus", "qty")
        .agg(F.sum("cents").alias("w"))
    )
    grp = Window.partitionBy("l_returnflag", "l_linestatus")
    cum = hist.select(
        "l_returnflag",
        "l_linestatus",
        "qty",
        "w",
        F.sum("w").over(grp.orderBy("qty")).alias("cw"),
        F.sum("w").over(grp).alias("tw"),
    )
    return cum.groupBy("l_returnflag", "l_linestatus").agg(
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("qty")))
        .cast("long")
        .alias("weighted_median_qty"),
        F.min("tw").cast("long").alias("total_weight"),
        F.count("*").cast("long").alias("n_distinct_values"),
    )


# ---------------------------------------------------------------------------
# Hourly OHLC candles
# ---------------------------------------------------------------------------
@q(
    "ev_candle_ohlc",
    oracle="""
    WITH framed AS (
        SELECT event_type, date_trunc('hour', ts) AS bar_hour, value,
               first_value(value) OVER w AS open,
               last_value(value) OVER w AS close
        FROM events
        WINDOW w AS (
            PARTITION BY event_type, date_trunc('hour', ts)
            ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
    SELECT event_type,
           strftime(bar_hour, '%Y-%m-%d %H:%M:%S') AS bar_hour,
           min(open) AS open,
           max(value) AS high,
           min(value) AS low,
           min(close) AS close,
           CAST(count(*) AS BIGINT) AS volume
    FROM framed GROUP BY event_type, bar_hour
    """,
    tags=("events", "window", "ohlc"),
)
def ev_candle_ohlc(spark, sf_dir):
    """Hourly OHLC candles per event type — the market-data rollup
    (open/high/low/close/volume per bar). Open and close come from ONE
    full-frame window (first_value/last_value ordered by (ts, event_id),
    the unique tiebreaker making both picks deterministic); high/low/
    volume are plain min/max/count. No double is ever summed, so every
    output value is a bit-exact pick of a stored value.

    100 TB posture: the window partitions by (type, hour) — state per
    task is one bar, never one instrument's history — and the follow-up
    aggregation reuses the same (type, hour) partitioning, so Catalyst
    plans ONE exchange for both operators. This is the shape that keeps
    candle building linear at exchange-feed volumes; the streaming twin
    is river_stream_window's tumbling aggregate."""
    ev = events_tbl(spark, sf_dir).select(
        "event_type",
        F.date_trunc("hour", "ts").alias("bar_hour"),
        "value",
        "ts",
        "event_id",
    )
    w = (
        Window.partitionBy("event_type", "bar_hour")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    framed = ev.select(
        "event_type",
        "bar_hour",
        "value",
        F.first("value").over(w).alias("open"),
        F.last("value").over(w).alias("close"),
    )
    return framed.groupBy(
        "event_type", F.date_format("bar_hour", "yyyy-MM-dd HH:mm:ss").alias("bar_hour")
    ).agg(
        F.min("open").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.min("close").alias("close"),
        F.count("*").alias("volume"),
    )


# ---------------------------------------------------------------------------
# Behavioral sequence-pattern matching
# ---------------------------------------------------------------------------
_SEQ_PATTERN = "v[^p]*p"  # a view eventually followed by a purchase


@q(
    "ev_sequence_pattern",
    oracle=f"""
    WITH coded AS (
        SELECT user_id, substr(event_type, 1, 1) AS code, ts, event_id
        FROM events),
    journeys AS (
        SELECT user_id,
               string_agg(code, '' ORDER BY ts, event_id) AS journey
        FROM coded GROUP BY user_id)
    SELECT user_id,
           CAST(length(journey) AS BIGINT) AS n_events,
           md5(journey) AS journey_md5,
           CAST(len(regexp_extract_all(journey, '{_SEQ_PATTERN}')) AS BIGINT)
               AS n_view_to_purchase,
           CAST(CASE WHEN journey LIKE '%vp%' THEN 1 ELSE 0 END AS BIGINT)
               AS has_adjacent_vp
    FROM journeys
    """,
    tags=("events", "sequence", "pattern"),
)
def ev_sequence_pattern(spark, sf_dir):
    """MATCH_RECOGNIZE's useful core without the syntax: each user's
    events collapse to an ordered single-char journey string (s/c/e/v/p
    initials, ordered by (ts, event_id)), and behavioral patterns become
    regex counts over that string — here non-overlapping view→purchase
    spans (`v[^p]*p`) plus an adjacent-vp flag. The journey itself is
    emitted as its md5, proving the two engines built the IDENTICAL
    string (order, codes, length) bit-for-bit, not just the same counts
    — the same Java-regex/RE2 agreement idiom text_pii_redact pins.

    100 TB posture: one hash aggregation builds the journeys
    (collect_list + array_sort — per-user state is that user's events,
    bounded by session scope in production); the regex scan is per-row
    compute on the aggregated string, embarrassingly parallel. No
    window, no self-join — the funnel family (ev_funnel) answers
    fixed-stage questions cheaper, but arbitrary patterns need the
    string form."""
    coded = events_tbl(spark, sf_dir).select(
        "user_id",
        F.substring("event_type", 1, 1).alias("code"),
        "ts",
        "event_id",
    )
    journeys = coded.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "code"))),
                lambda x: x["code"],
            ),
            "",
        ).alias("journey")
    )
    return journeys.select(
        "user_id",
        F.length("journey").cast("long").alias("n_events"),
        F.md5("journey").alias("journey_md5"),
        F.size(F.expr(f"regexp_extract_all(journey, '{_SEQ_PATTERN}', 0)"))
        .cast("long")
        .alias("n_view_to_purchase"),
        F.col("journey").contains("vp").cast("long").alias("has_adjacent_vp"),
    )


# ---------------------------------------------------------------------------
# Grid-bucketed spatial proximity join
# ---------------------------------------------------------------------------
_GEO_SPAN = 1_000_000  # coordinate domain [0, 1e6) in micro-units
_GEO_CELL = 30_000  # grid cell edge = search radius
_GEO_R2 = _GEO_CELL * _GEO_CELL


def _geo_coord_sql(key: str, axis: str, dialect: str) -> str:
    """Deterministic micro-coordinate in [0, _GEO_SPAN) from an int key —
    md5-prefix so the oracle replays the exact point set."""
    if dialect == "spark":
        return (
            f"pmod(cast(conv(substring(md5(concat('{axis}', cast({key} as string))), "
            f"1, 12), 16, 10) as bigint), {_GEO_SPAN})"
        )
    return (
        f"(('0x' || substr(md5('{axis}' || CAST({key} AS VARCHAR)), 1, 12))::BIGINT "
        f"% {_GEO_SPAN})"
    )


@q(
    "geo_grid_proximity",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey AS id,
               {_geo_coord_sql('c_custkey', 'x', 'duckdb')} AS x,
               {_geo_coord_sql('c_custkey', 'y', 'duckdb')} AS y
        FROM customer),
    offs AS (
        SELECT dx, dy FROM (SELECT unnest([-1, 0, 1]) AS dx),
                           (SELECT unnest([-1, 0, 1]) AS dy)),
    probe AS (
        SELECT id, x, y,
               (x // {_GEO_CELL}) + dx AS cx, (y // {_GEO_CELL}) + dy AS cy
        FROM pts, offs),
    anchor AS (
        SELECT id, x, y, x // {_GEO_CELL} AS cx, y // {_GEO_CELL} AS cy
        FROM pts)
    SELECT a.id AS id_a, b.id AS id_b,
           CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                AS BIGINT) AS dist2
    FROM probe a JOIN anchor b ON a.cx = b.cx AND a.cy = b.cy AND a.id < b.id
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_GEO_R2}
    """,
    tags=("geo", "spatial", "scale"),
    bench=True,
)
def geo_grid_proximity(spark, sf_dir):
    """Spatial proximity self-join without the cross product — the
    geohash/grid-bucket pattern: deterministic integer micro-coordinates
    per customer, cells of edge r, and each point probes its 3x3 cell
    neighborhood against anchors indexed at their exact cell. A pair
    within radius r must share a probe/anchor cell (cell edge = r), the
    probe-side explode is a fixed x9, and (a.id < b.id) with exact-cell
    anchors yields each pair EXACTLY once — no distinct needed. Distance
    math is pure int64 (dist^2 vs r^2), so the gate is bit-exact with no
    haversine float drift.

    100 TB posture: this is the equi-join face of spatial search — the
    only shuffle is by cell id, fan-out is a constant 9, and cell
    population (not dataset size) bounds per-key work; a skewed city
    cell gets the same salting/AQE treatment as any hot key. The
    all-pairs baseline is O(n^2) and simply does not exist at scale.
    Same shape as emb_ann_lsh's bucket equi-join, in 2-D."""
    pts = tbl(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.expr(_geo_coord_sql("c_custkey", "x", "spark")).alias("x"),
        F.expr(_geo_coord_sql("c_custkey", "y", "spark")).alias("y"),
    )
    offs = F.expr("explode(flatten(transform(array(-1,0,1), dx -> transform(array(-1,0,1), dy -> struct(dx, dy)))))")
    probe = pts.select("id", "x", "y", offs.alias("o")).select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        (F.expr(f"x div {_GEO_CELL}") + F.col("o.dx")).alias("cx"),
        (F.expr(f"y div {_GEO_CELL}") + F.col("o.dy")).alias("cy"),
    )
    anchor = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.expr(f"x div {_GEO_CELL}").alias("cx"),
        F.expr(f"y div {_GEO_CELL}").alias("cy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        probe.join(anchor, ["cx", "cy"])
        .filter((F.col("id_a") < F.col("id_b")) & (d2 <= F.lit(_GEO_R2)))
        .select("id_a", "id_b", d2.cast("long").alias("dist2"))
    )


# ---------------------------------------------------------------------------
# PageRank (two unrolled Jacobi iterations)
# ---------------------------------------------------------------------------
_PR_DAMP = 0.85
_PR_EDGES_SQL = f"""
    ob AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e AS (
        SELECT a.p AS pa, b.p AS pb
        FROM ob a JOIN ob b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= {_TRI_MIN_SUP}),
    und AS (
        SELECT pa AS u, pb AS v FROM e
        UNION ALL SELECT pb AS u, pa AS v FROM e),
    nodes AS (SELECT DISTINCT u AS nid FROM und),
    deg AS (SELECT u AS nid, count(*) AS outd FROM und GROUP BY 1),
    n AS (SELECT count(*) AS cnt FROM nodes)
"""


def _pr_iter_sql(prev: str, this: str) -> str:
    """One Jacobi PageRank step in portable SQL: every node's new rank is
    teleport + damping * sum of in-neighbor rank/out-degree."""
    return f"""
    {this} AS (
        SELECT nodes.nid,
               0.15 / (SELECT cnt FROM n)
                 + {_PR_DAMP} * coalesce(sum({prev}.pr / deg.outd), 0) AS pr
        FROM nodes
        LEFT JOIN und ON und.v = nodes.nid
        LEFT JOIN {prev} ON {prev}.nid = und.u
        LEFT JOIN deg ON deg.nid = und.u
        GROUP BY nodes.nid)
    """


@q(
    "graph_pagerank",
    oracle=f"""
    WITH {_PR_EDGES_SQL},
    r0 AS (SELECT nid, 1.0 / (SELECT cnt FROM n) AS pr FROM nodes),
    {_pr_iter_sql('r0', 'r1')},
    {_pr_iter_sql('r1', 'r2')}
    SELECT nid, round(pr, 12) AS pagerank FROM r2
    """,
    tags=("graph", "pagerank", "scale"),
)
def graph_pagerank(spark, sf_dir):
    """PageRank over the part co-purchase graph, two unrolled Jacobi
    iterations from the uniform vector (teleport 0.15, damping 0.85).
    Each iteration is the canonical distributed shape: contributions =
    rank/out-degree shipped along edges (one equi-join), summed per
    destination (one hash agg), teleport added on the |V|-row node
    table. The graph is undirected (every edge contributes both ways),
    so out-degree = degree and there are no dangling nodes by
    construction. Ranks are rounded to 12 decimals in-query — 3-4 orders
    above the worst cross-engine summation-order drift (~1e-17 absolute
    at ~115 terms x 1e-3 ranks) and far below any real rank gap.

    100 TB posture: the unrolled two iterations ARE the production loop
    body — at scale you iterate it to convergence with the rank vector
    localCheckpoint'ed each round to truncate lineage (exactly the
    machinery operators/components.py's label propagation uses), edges
    partitioned by source so the contribution join never reshuffles the
    big side. The |V|-row degree table scales with the graph, so it is
    NOT broadcast-hinted — AQE picks broadcast while it fits and
    shuffled join beyond. Per-iteration cost is one shuffle of |E|
    contributions — no all-pairs anything."""
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    ob = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    a, b = ob.alias("a"), ob.alias("b")
    e = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= _TRI_MIN_SUP)
        .select("pa", "pb")
    )
    und = e.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionByName(
        e.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    nodes = und.select(F.col("u").alias("nid")).distinct()
    deg = und.groupBy(F.col("u").alias("nid")).agg(F.count("*").alias("outd"))
    n_nodes = nodes.count()  # |V|: scalar driver constant, like K in k-means
    rank = nodes.select("nid", F.lit(1.0 / n_nodes).alias("pr"))
    for _ in range(2):
        contrib = (
            und.join(
                rank.select(F.col("nid").alias("u"), F.col("pr").alias("pr_u")), "u"
            )
            .join(
                deg.select(F.col("nid").alias("u"), "outd"), "u"
            )
            .groupBy(F.col("v").alias("nid"))
            .agg(F.sum(F.col("pr_u") / F.col("outd")).alias("inbound"))
        )
        rank = nodes.join(contrib, "nid", "left").select(
            "nid",
            (
                F.lit(0.15 / n_nodes)
                + F.lit(_PR_DAMP) * F.coalesce("inbound", F.lit(0.0))
            ).alias("pr"),
        )
    return rank.select("nid", F.round("pr", 12).alias("pagerank"))
