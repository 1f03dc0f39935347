"""Distributed connected components over a near-duplicate pair graph.

The missing last step of every LSH dedup family in this repo: MinHash /
SimHash / cosine buckets emit PAIRS, but retention decisions need
CLUSTERS — transitive closure, then one canonical survivor per cluster.
(a~b and b~c must collapse to one kept doc even when a~c was never
emitted as a pair.) The reference leaves clustering to its consumers
entirely (its analytics surface is pandas groupby/merge,
/root/reference/performance/performance.py:124-148).

Algorithm: iterative min-label propagation with path compression —
each round every node takes the min label over {itself} ∪ neighbours
(one shuffle join + hash aggregate), then labels are compressed one
pointer hop (label := label's label, a second join). Compression makes
label trees collapse geometrically, so convergence is O(log diameter)
rounds, the same bound as the small-star/large-star formulation of
Kiveris et al., "Connected Components in MapReduce and Beyond" (SOCC
'14) — but with two fixed-shape joins per round that AQE can plan
(broadcast when the frontier shrinks). Convergence is detected by the
label-sum aggregate, which is strictly decreasing until fixpoint —
a one-row jobside check, no collect of data rows.

At 100 TB: every round is |E| + |V| shuffle traffic, ~log(diameter)
rounds (near-dup graphs have tiny diameters — dup clusters are dense),
each iteration's result is persisted and the previous unpersisted so
lineage stays O(1) deep. Skewed super-nodes (one doc near-dup of
millions) cost a hot key in the neighbour-min aggregate — that
aggregate is partial-agg friendly (min), so the hot key combines
map-side and never builds a row list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAX_ROUNDS = 50


def _cached_ids(spark) -> set[int]:
    return {
        int(i)
        for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }


def _unpersist_ids(spark, ids) -> None:
    """Free specific checkpoint block sets by RDD id. DataFrame.unpersist
    cannot do this: localCheckpoint registers at the RDD layer, not the
    SQL CacheManager, so the DataFrame-level call is a no-op on it."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for i in ids:
        r = jmap.get(i)
        if r is not None:
            r.unpersist(False)


def _ckpt(df):
    """localCheckpoint(eager) + record which persistent RDD ids it
    created, so superseded iterations can be freed precisely. Id capture
    is a before/after delta — callers must not checkpoint concurrently
    in the same session (queries here are single-flight)."""
    spark = df.sparkSession
    before = _cached_ids(spark)
    out = df.localCheckpoint(eager=True)
    return out, _cached_ids(spark) - before


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = _MAX_ROUNDS,
) -> DataFrame:
    """Return (id, component) where component = min node id reachable
    from ``id`` over the undirected ``edges``. ``nodes`` must contain
    every endpoint (isolated nodes allowed and kept, as their own
    singleton component)."""
    sym = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .union(edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d")))
        .distinct()
    )
    # localCheckpoint truncates lineage each round: without it the
    # logical plan doubles every iteration (persist caches DATA but
    # Catalyst still re-analyzes the full plan history) and analysis
    # time blows up exponentially. On a cluster use checkpoint() with a
    # reliable dir for fault tolerance; localCheckpoint keeps blocks on
    # executors, which is the right trade for an O(log d)-round loop.
    sym, sym_ids = _ckpt(sym)
    labels, labels_ids = _ckpt(
        nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("label"))
    )
    spark = labels.sparkSession
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_rounds):
        # neighbour-min: the smallest label adjacent to each node
        nbr = (
            sym.join(labels.withColumnRenamed("id", "s"), "s")
            .groupBy("d")
            .agg(F.min("label").alias("nl"))
            .withColumnRenamed("d", "id")
        )
        stepped = (
            labels.join(nbr, "id", "left")
            .select("id", F.least("label", F.coalesce("nl", "label")).alias("label"))
        )
        # path compression: one pointer hop, label := label(label)
        lab2 = stepped.select(
            F.col("id").alias("lid"), F.col("label").alias("llabel")
        )
        compressed, new_ids = _ckpt(
            stepped.join(lab2, stepped["label"] == lab2["lid"], "left").select(
                "id",
                F.least("label", F.coalesce("llabel", "label")).alias("label"),
            )
        )
        cur_sum = compressed.agg(F.sum("label")).collect()[0][0]
        # the new checkpoint is materialized — the superseded round's
        # blocks are dead; free them NOW so round count never translates
        # into executor storage growth
        _unpersist_ids(spark, labels_ids)
        labels, labels_ids = compressed, new_ids
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")
    _unpersist_ids(spark, sym_ids)
    # The FINAL round's blocks stay cached: the returned DataFrame's
    # lineage was truncated to them, so they must live until the caller
    # consumes the result; Spark's ContextCleaner frees them once the
    # caller's reference is garbage collected.
    return labels.withColumnRenamed("label", "component")
