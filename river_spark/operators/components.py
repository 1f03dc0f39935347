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
    sym = sym.localCheckpoint(eager=True)
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=True)
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
        compressed = (
            stepped.join(lab2, stepped["label"] == lab2["lid"], "left")
            .select(
                "id",
                F.least("label", F.coalesce("llabel", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = compressed.agg(F.sum("label")).collect()[0][0]
        labels = compressed
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")
    out = labels.withColumnRenamed("label", "component")
    # hand the caller an unpersisted logical result; the iteration cache
    # stays alive only until the session clears it
    return out
