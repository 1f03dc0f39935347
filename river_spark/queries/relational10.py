"""Relational wave 10 (round 8, session 4): frontier analytics, market
VWAP, training-order plumbing, and iterative BFS.

- ``agg_pareto_frontier``: 2-D skyline (Pareto-optimal orders) with a
  grid prefilter so the exact pass runs over survivors only — the
  scale-canonical skyline shape.
- ``ev_vwap``: volume-weighted average price per return flag and ship
  month, plus the running (cumulative) VWAP — integer sums, one final
  division, no float accumulation.
- ``pipeline_global_shuffle``: deterministic training-order shard +
  position assignment from an md5 hash — the global shuffle a trainer
  consumes, with per-shard (not global) row numbering so no stage ever
  collapses to one partition.
- ``pipeline_curriculum_order``: curriculum schedule over difficulty
  phases (fixed length thresholds, pure map-side), with cumulative
  unlock stats per phase.
- ``graph_bfs_hops``: breadth-first hop distance from the lowest-keyed
  node of the part co-purchase graph, iterative frontier expansion with
  an anti-join visited set; oracle is a recursive CTE.

Bit-exactness rules follow tests/test_oracle.py: integer outputs
wherever possible; the only doubles are single divisions of two exact
integers (bit-identical IEEE division in both engines).

Reference parity: the reference engine (pbotros/river) has no
relational layer (its surface is the stream transport,
/root/reference/cpp/src/writer.cpp); these extend the analytics surface
the brief requires.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import tbl

# Grid width for the skyline prefilter: price buckets of $1,000.
_SKY_BUCKET_CENTS = 100_000
# Curriculum difficulty: phase = min(n_chars // _CURR_STEP, 9).
_CURR_STEP = 200
# Training shuffle fan-out.
_N_SHARDS = 8
# Co-purchase support floor (same as relational8's graph family).
_BFS_MIN_SUP = 2
_BFS_MAX_HOPS = 3


# ---------------------------------------------------------------------------
# 2-D skyline with grid prefilter
# ---------------------------------------------------------------------------
@q(
    "agg_pareto_frontier",
    oracle="""
    WITH pts AS (
        SELECT o.o_orderkey,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents,
               CAST(count(*) AS BIGINT) AS n_items
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_totalprice
    ), dp AS (
        SELECT price_cents, n_items,
               CAST(count(*) AS BIGINT) AS n_orders,
               min(o_orderkey) AS min_orderkey
        FROM pts GROUP BY price_cents, n_items
    )
    SELECT price_cents, n_items, n_orders, min_orderkey
    FROM dp d
    WHERE NOT EXISTS (
        SELECT 1 FROM dp e
        WHERE e.price_cents <= d.price_cents AND e.n_items >= d.n_items
          AND (e.price_cents < d.price_cents OR e.n_items > d.n_items))
    """,
    tags=("agg", "skyline", "frontier"),
)
def agg_pareto_frontier(spark, sf_dir):
    """Pareto frontier (skyline) of orders on (price minimize, item
    count maximize): an order is Pareto-optimal iff no other order is
    at most as expensive AND has at least as many line items, with one
    strict. Emitted per distinct (price, items) point with its order
    count and lowest order key.

    Three stages, each sized for 100 TB:
    1. distinct-point reduction — a hash aggregation collapses the
       order stream to distinct (price_cents, n_items) points (the
       skyline of a set equals the skyline of its distinct points);
    2. grid prefilter — per price-bucket max item count (a second tiny
       agg), running max over strictly-earlier buckets (window over
       the <=#buckets-row bucket table), broadcast back: any point
       whose item count <= the best of a strictly-cheaper bucket is
       provably dominated (bucket order is strict on price) and is
       dropped map-side. Survivors are O(frontier + one bucket width),
       not O(points).
    3. exact pass — the classic sorted sweep as ONE window over the
       survivors: sort (price asc, items desc); a point is on the
       frontier iff its item count beats the running max of all
       earlier points. Single-partition, but only over the pruned
       remnant — the same survivors-only discipline as
       dedup_minhash_lsh's exact verify.

    The NOT EXISTS self-join oracle is exhaustive-quadratic on
    purpose: it is the spec, not the plan."""
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey")
    pts = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count("*").alias("n_items"))
        .select(
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_cents"),
            F.col("n_items").cast("bigint").alias("n_items"),
            "o_orderkey",
        )
    )
    dp = pts.groupBy("price_cents", "n_items").agg(
        F.count("*").alias("n_orders"),
        F.min("o_orderkey").alias("min_orderkey"),
    )
    bucket = (F.col("price_cents") / _SKY_BUCKET_CENTS).cast("bigint")
    grid = dp.groupBy(bucket.alias("bkt")).agg(F.max("n_items").alias("bkt_max"))
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    grid = grid.select("bkt", F.max("bkt_max").over(wb).alias("prior_max"))
    survivors = (
        dp.join(F.broadcast(grid), bucket == F.col("bkt"), "left")
        .filter(F.col("prior_max").isNull() | (F.col("prior_max") < F.col("n_items")))
        .drop("bkt", "prior_max")
    )
    ws = Window.orderBy(F.col("price_cents").asc(), F.col("n_items").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        survivors.withColumn("run_max", F.max("n_items").over(ws))
        .filter(F.col("run_max").isNull() | (F.col("run_max") < F.col("n_items")))
        .select("price_cents", "n_items", "n_orders", "min_orderkey")
    )


# ---------------------------------------------------------------------------
# VWAP + cumulative VWAP
# ---------------------------------------------------------------------------
@q(
    "ev_vwap",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               strftime(date_trunc('month', l_shipdate), '%Y-%m') AS ship_month,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS BIGINT) AS pv,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem GROUP BY 1, 2)
    SELECT l_returnflag, ship_month, qty,
           pv * 1.0 / qty AS vwap_cents,
           sum(pv) OVER w * 1.0 / sum(qty) OVER w AS cum_vwap_cents
    FROM m
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY ship_month
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("events", "window", "market"),
)
def ev_vwap(spark, sf_dir):
    """Volume-weighted average price per (return flag, ship month) and
    the cumulative VWAP over each flag's month series — the standard
    market rollup, done with exact integer arithmetic: prices become
    cents (bigint), quantities bigint, the per-group sums are integer
    (order-independent, engine-independent), and the only floating
    point is one final division of two exact integers — bit-identical
    IEEE in Spark and DuckDB, so the gate compares at full precision
    with no rounding.

    100 TB posture: stage 1 is a map-side-combinable hash agg on
    (flag, month) — partials everywhere, one shuffle of group rows.
    The running window then operates on the AGGREGATED table (#flags x
    #months rows, thousands at most), partitioned by flag — never a
    window over raw fact rows, and never a global single-partition
    sort."""
    li = tbl(spark, sf_dir, "lineitem")
    m = (
        li.groupBy(
            "l_returnflag",
            F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
                * F.col("l_quantity").cast("bigint")
            ).alias("pv"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
        )
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("ship_month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return m.select(
        "l_returnflag",
        "ship_month",
        "qty",
        (F.col("pv") * 1.0 / F.col("qty")).alias("vwap_cents"),
        (F.sum("pv").over(w) * 1.0 / F.sum("qty").over(w)).alias("cum_vwap_cents"),
    )


# ---------------------------------------------------------------------------
# Deterministic global shuffle for training order
# ---------------------------------------------------------------------------
@q(
    "pipeline_global_shuffle",
    oracle="""
    WITH h AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 4)) AS INT) AS hv
        FROM documents)
    SELECT doc_id, CAST(hv % 8 AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY hv % 8
                                   ORDER BY hv, doc_id) AS BIGINT) AS pos
    FROM h
    """,
    tags=("pipeline", "shuffle", "training"),
)
def pipeline_global_shuffle(spark, sf_dir):
    """Deterministic global training shuffle: every document gets a
    (shard, position) from an md5 hash of its id — the order a trainer
    streams, reproducible across runs, engines, and corpus insertion
    order (append-only corpora keep old docs' positions stable within
    a shard prefix only if resharded consistently; the guarantee here
    is run-to-run determinism, the property data loaders need).

    100 TB posture (round 11): the shard assignment is pure map-side,
    and the per-shard position — previously one sort task per shard,
    i.e. parallelism capped at the FIXED _N_SHARDS — now runs through
    stitched_row_number with an hv-range bucket (shards x hash-ranges
    parallelism, row-identical). There is deliberately NO global
    row_number (a no-partition window collapses to one task). A trainer
    wanting a single global order reads shards round-robin — equivalent
    by construction since shard is the hash's low bits and within-shard
    order is (hash, id). md5 (not xxhash64) so DuckDB replays the exact
    assignment."""
    from river_spark.operators.stitched_lag import stitched_row_number

    docs = tbl(spark, sf_dir, "documents")
    hv = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "int"
    )
    assigned = docs.select("doc_id", hv.alias("hv")).withColumn(
        "shard", (F.col("hv") % _N_SHARDS).cast("int")
    )
    return (
        stitched_row_number(
            assigned,
            key_cols=["shard"],
            order_cols=["hv", "doc_id"],
            bucket=F.expr("hv div 64"),
            out_col="pos",
        )
        .select("doc_id", "shard", "pos")
    )


# ---------------------------------------------------------------------------
# Curriculum schedule
# ---------------------------------------------------------------------------
@q(
    "pipeline_curriculum_order",
    oracle="""
    WITH p AS (
        SELECT least(n_chars // 200, 9) AS phase,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS phase_chars
        FROM documents GROUP BY 1)
    SELECT CAST(phase AS BIGINT) AS phase, n_docs, phase_chars,
           CAST(sum(n_docs) OVER w AS BIGINT) AS cum_docs,
           CAST(sum(phase_chars) OVER w AS BIGINT) AS cum_chars
    FROM p
    WINDOW w AS (ORDER BY phase ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
    """,
    tags=("pipeline", "curriculum", "training"),
)
def pipeline_curriculum_order(spark, sf_dir):
    """Curriculum schedule: documents are binned into 10 difficulty
    phases by fixed length thresholds (length is the classic cheap
    difficulty proxy), and each phase row reports how much corpus a
    curriculum that unlocks phases 0..p has available — cumulative
    docs and chars. All integers.

    Fixed thresholds rather than ntile/percent_rank is a scale
    decision, not a shortcut: a quantile bin needs a global sort or a
    sampled-quantile broadcast, while a threshold bin is pure map-side
    and reproducible as the corpus grows (a document's phase never
    drifts because OTHER documents arrived — the same stability
    argument as the md5 split in pipeline_train_split). The running
    totals are a window over the 10-row phase table."""
    docs = tbl(spark, sf_dir, "documents")
    p = (
        docs.groupBy(
            F.least(F.floor(F.col("n_chars") / _CURR_STEP), F.lit(9)).alias("phase")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("phase_chars"),
        )
    )
    w = Window.orderBy("phase").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return p.select(
        F.col("phase").cast("bigint").alias("phase"),
        "n_docs",
        "phase_chars",
        F.sum("n_docs").over(w).alias("cum_docs"),
        F.sum("phase_chars").over(w).alias("cum_chars"),
    )


# ---------------------------------------------------------------------------
# BFS hop distance
# ---------------------------------------------------------------------------
@q(
    "graph_bfs_hops",
    oracle="""
    WITH ob AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
        SELECT a.p AS pa, b.p AS pb
        FROM ob a JOIN ob b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p HAVING count(*) >= 2
    ), und AS (
        SELECT pa AS u, pb AS v FROM e
        UNION ALL SELECT pb AS u, pa AS v FROM e
    ), seed AS (
        SELECT min(u) AS s FROM und
    ), bfs AS (
        WITH RECURSIVE r(nid, hop) AS (
            SELECT s, 0 FROM seed
            UNION
            SELECT und.v, r.hop + 1 FROM r JOIN und ON und.u = r.nid
            WHERE r.hop < 3
        ) SELECT * FROM r
    )
    SELECT nid, CAST(min(hop) AS INT) AS hop FROM bfs GROUP BY nid
    """,
    tags=("graph", "bfs", "iterative"),
)
def graph_bfs_hops(spark, sf_dir):
    """Breadth-first hop distance (0..3) from the lowest-keyed node of
    the part co-purchase graph — the neighborhood-expansion primitive
    behind "related products within k hops". The Spark side is the
    canonical distributed BFS loop: per hop, one equi-join ships the
    frontier along edges, distinct collapses multi-paths, and a
    left-anti join against the visited set keeps the frontier minimal
    (a node is emitted at its FIRST hop only — exactly min(hop), which
    is what the recursive-CTE oracle computes independently).

    100 TB posture: per-hop cost is one shuffle of frontier-incident
    edges — never |V| x |E|; the visited set grows monotonically and
    is the anti-join's build side; a deep-diameter graph would add
    localCheckpoint every few hops exactly like operators/graph.py's
    pagerank loop (3 unrolled hops keep the lineage trivially
    shallow). The single driver-side action is the seed scalar — the
    same pattern as pagerank's |V| constant."""
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    ob = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = ob.alias("a"), ob.alias("b")
    e = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= _BFS_MIN_SUP)
        .select("pa", "pb")
    )
    und = e.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionByName(
        e.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    from river_spark.operators.components import _strip_origin_stats
    from river_spark.operators.graph import _persisted_rdd_ids, _unpersist_rdd_ids

    und = und.persist()
    seed = und.agg(F.min("u")).collect()[0][0]
    visited = spark.createDataFrame([(seed, 0)], "nid bigint, hop int")
    frontier = visited.select("nid")
    prev_ids: set = set()
    for hop in range(1, _BFS_MAX_HOPS + 1):
        nxt = (
            frontier.join(und, frontier.nid == und.u)
            .select(F.col("v").alias("nid"))
            .distinct()
            .join(visited.select("nid"), "nid", "left_anti")
            .withColumn("hop", F.lit(hop))
        )
        ids_before = _persisted_rdd_ids(spark)
        # _strip_origin_stats: the per-hop frontier join multiplies the
        # carried Catalyst size stat (see operators/components.py)
        visited = _strip_origin_stats(
            visited.unionByName(nxt).localCheckpoint(eager=True)
        )
        new_ids = _persisted_rdd_ids(spark) - ids_before
        # superseded frontier checkpoints release once the new one holds
        # the union (graph.py discipline; never the latest — its blocks
        # are the only copy of lineage-truncated data)
        _unpersist_rdd_ids(spark, prev_ids)
        prev_ids = new_ids
        frontier = visited.filter(F.col("hop") == hop).select("nid")
    und.unpersist()
    return visited.select("nid", F.col("hop").cast("int").alias("hop"))
