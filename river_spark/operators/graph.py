"""Iterative graph operators — the production loop bodies behind the
registry's unrolled graph queries.

`queries/relational8.graph_pagerank` unrolls exactly two Jacobi
iterations so its DuckDB oracle can replay the plan; this module is the
loop you actually run at scale: iterate-to-convergence with the rank
vector's lineage truncated every round (localCheckpoint), superseded
iterations unpersisted, and an L1-delta stopping rule — the same
checkpoint discipline as `operators/components.py`'s label propagation
(which is the connected-components member of this family).

Reference parity: the reference engine (pbotros/river) has no graph
layer; these extend the analytics surface the brief requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _persisted_rdd_ids(spark) -> set[int]:
    """Ids of every RDD currently pinned in executor storage."""
    m = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in m.keySet().toArray()}


def _unpersist_rdd_ids(spark, ids) -> None:
    """Release specific pinned RDDs by id (non-blocking).

    Dataset.unpersist() does NOT release a localCheckpoint — the data
    lives in an internal RDD the Dataset handle doesn't own, so without
    this the superseded checkpoints linger until ContextCleaner GC
    (tests/test_graph_ops.py pins the regression). Ids are diffed
    around each checkpoint call; this assumes the driver isn't
    concurrently persisting unrelated RDDs mid-loop (true for a
    driver-side iterative operator)."""
    m = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in ids:
        jrdd = m.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank over an UNDIRECTED edge list ``(u, v)`` (each edge
    contributes both directions, so out-degree = degree and no dangling
    mass exists). Returns ``(nid, pr)``.

    Loop shape per iteration — the canonical distributed PageRank:
    contributions = rank/degree shipped along edges (one equi-join on
    the source key), summed per destination (one hash aggregation),
    teleport added on the node table (left join keeps isolated-rank
    destinations). Stops when the L1 delta between successive rank
    vectors drops below ``tol`` or after ``max_iter`` rounds.

    100 TB posture:
    - lineage: every ``checkpoint_every`` rounds the rank DataFrame is
      localCheckpoint'ed (eager) so the plan does not grow by one
      join+agg per iteration — without this, round ~15 dies in the
      optimizer long before the cluster is the bottleneck;
    - memory: the superseded rank vector is unpersisted by reference
      as soon as the next one is materialized;
    - the degree table is |V|-sized; it is NOT broadcast-hinted here —
      at billion-node scale Catalyst/AQE must be free to pick a shuffle
      join, while vocabulary-sized graphs still get the broadcast from
      AQE's size estimate;
    - convergence is checked with one tiny agg per round (sum of
      |delta|), the only driver-side action besides the initial count.
    """
    und = edges.select(F.col(edges.columns[0]).alias("u"), F.col(edges.columns[1]).alias("v"))
    und = und.unionByName(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    nodes = und.select(F.col("u").alias("nid")).distinct()
    deg = und.groupBy(F.col("u").alias("nid")).agg(F.count("*").alias("outd"))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pr", F.lit(0.0))
    teleport = (1.0 - damping) / n

    from river_spark.operators.components import _strip_origin_stats

    spark = edges.sparkSession
    ids0 = _persisted_rdd_ids(spark)
    # _strip_origin_stats (r15): localCheckpoint preserves the origin
    # plan's Catalyst sizeInBytes, and the size-only estimator MULTIPLIES
    # child sizes at each join — carried across checkpoints the stat
    # grows geometrically with iteration count (see components.py for
    # the measured pathology), so every checkpoint here re-wraps to a
    # fresh LogicalRDD with constant default stats.
    rank = _strip_origin_stats(
        nodes.select("nid", F.lit(1.0 / n).alias("pr")).localCheckpoint(eager=True)
    )
    prev_ids = _persisted_rdd_ids(spark) - ids0
    prev_persisted = rank
    for it in range(1, max_iter + 1):
        contrib = (
            und.join(rank.select(F.col("nid").alias("u"), F.col("pr").alias("pr_u")), "u")
            .join(deg.select(F.col("nid").alias("u"), "outd"), "u")
            .groupBy(F.col("v").alias("nid"))
            .agg(F.sum(F.col("pr_u") / F.col("outd")).alias("inbound"))
        )
        new_rank = nodes.join(contrib, "nid", "left").select(
            "nid",
            (F.lit(teleport) + F.lit(damping) * F.coalesce("inbound", F.lit(0.0))).alias(
                "pr"
            ),
        )
        if it % checkpoint_every == 0 or it == max_iter:
            ids_before = _persisted_rdd_ids(spark)
            new_rank = _strip_origin_stats(new_rank.localCheckpoint(eager=True))
            new_ids = _persisted_rdd_ids(spark) - ids_before
            delta = (
                new_rank.alias("a")
                .join(prev_persisted.alias("b"), "nid")
                .agg(F.sum(F.abs(F.col("a.pr") - F.col("b.pr"))).alias("d"))
                .collect()[0]["d"]
            )
            # Release the superseded checkpoint NOW that the delta agg
            # (its last reader) has run — relying on JVM GC/ContextCleaner
            # pins up to max_iter/checkpoint_every rank vectors in
            # executor storage, an OOM at billion-node scale. Never
            # release the LATEST checkpoint: localCheckpoint truncates
            # lineage, so its blocks are the only copy of the data.
            _unpersist_rdd_ids(spark, prev_ids)
            prev_ids = new_ids
            prev_persisted = new_rank
            rank = new_rank
            if delta is not None and delta < tol:
                break
        else:
            rank = new_rank
    return rank.select("nid", "pr")
