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
pointer hop against the PREVIOUS round's checkpointed mapping (label :=
prev_label(label), a second join whose right side is already
materialized, so the neighbour-min stage executes once per round).
Compression makes label trees collapse geometrically, so convergence is
O(log diameter) rounds, the same bound as the small-star/large-star
formulation of Kiveris et al., "Connected Components in MapReduce and
Beyond" (SOCC '14) — but with two fixed-shape joins per round that AQE
can plan (broadcast when the frontier shrinks). Convergence is an exact
changed-label count against the previous round (type-agnostic: ids may
be numeric, string fingerprints, anything with a total order under
``least``/``min``), costing one co-partitioned join of two checkpointed
frames — no collect of data rows.

At 100 TB: every round is |E| + |V| shuffle traffic, ~log(diameter)
rounds (near-dup graphs have tiny diameters — dup clusters are dense),
each iteration's result is checkpointed and the previous freed so
lineage AND executor storage stay O(1) deep. Skewed super-nodes (one
doc near-dup of millions) cost a hot key in the neighbour-min aggregate
— that aggregate is partial-agg friendly (min), so the hot key combines
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


def _strip_origin_stats(df: DataFrame) -> DataFrame:
    """Re-wrap a checkpointed DataFrame over its own (already
    materialized) RDD so the new LogicalRDD does NOT inherit the origin
    plan's size statistics.

    Why (r15, found by thread-dumping a stuck round): localCheckpoint
    preserves the checkpointed plan's Catalyst statistics so the
    optimizer can keep making broadcast decisions. But the size-only
    estimator MULTIPLIES child sizeInBytes at every join, and each
    label-propagation round joins two frames derived from the previous
    round's checkpoint — so the carried BigInt SQUARES per round. Its
    bit length doubles every iteration (measured: ~7,800 decimal digits
    by round 20 at sf0.1) and late rounds burn whole seconds inside
    BigInteger.multiplyToomCook3 in SizeInBytesOnlyStatsPlanVisitor —
    planning cost, growing exponentially with round count, at ANY data
    size. Resetting to a fresh LogicalRDD (stats = defaultSizeInBytes,
    a constant) breaks the chain; AQE still picks broadcast joins at
    runtime from actual shuffle sizes, so the executed plans are
    unchanged. Falls back to the original frame if the internal
    constructor is unavailable."""
    try:
        jdf = df._jdf
        spark = df.sparkSession
        new_jdf = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(new_jdf, spark)
    except Exception:  # noqa: BLE001 - API drift: keep correctness, lose speed
        return df


def _ckpt(df):
    """localCheckpoint(eager) + record which persistent RDD ids it
    created, so superseded iterations can be freed precisely. Id capture
    is a before/after delta — callers must not checkpoint concurrently
    in the same session (queries here are single-flight)."""
    spark = df.sparkSession
    before = _cached_ids(spark)
    try:
        out = df.localCheckpoint(eager=True)
    except BaseException:
        # localCheckpoint registers persistence BEFORE running the job:
        # a failed materialization strands a half-cached RDD entry
        _unpersist_ids(spark, _cached_ids(spark) - before)
        raise
    return _strip_origin_stats(out), _cached_ids(spark) - before


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
    singleton component). Ids may be any orderable type — numeric doc
    ids or string fingerprints alike."""
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
    spark = sym.sparkSession
    live = set(sym_ids)  # every block set this call owns
    try:
        labels, labels_ids = _ckpt(
            nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("label"))
        )
        live |= set(labels_ids)
        for _ in range(max_rounds):
            # neighbour-min: the smallest label adjacent to each node
            nbr = (
                sym.join(labels.withColumnRenamed("id", "s"), "s")
                .groupBy("d")
                .agg(F.min("label").alias("nl"))
                .withColumnRenamed("d", "id")
            )
            stepped = labels.withColumnRenamed("label", "prev").join(
                nbr, "id", "left"
            ).select(
                "id",
                "prev",
                F.least("prev", F.coalesce("nl", "prev")).alias("label"),
            )
            # path compression: one pointer hop through the PREVIOUS
            # round's checkpointed mapping (prev_label(x) <= x, so this
            # is a monotone improvement and the exact fixpoint check
            # below still decides convergence). Using `labels` — already
            # materialized — as the lookup side means `stepped`'s
            # neighbour-min stage appears exactly once in this plan;
            # compressing through `stepped` itself would re-execute it
            # on both join branches every round.
            lab2 = labels.select(
                F.col("id").alias("lid"), F.col("label").alias("llabel")
            )
            final = F.least("label", F.coalesce("llabel", "label"))
            compressed, new_ids = _ckpt(
                stepped.join(lab2, stepped["label"] == lab2["lid"], "left").select(
                    "id",
                    final.alias("label"),
                    # convergence flag rides the checkpoint (r15): each
                    # row knows its previous label (carried through
                    # `stepped`), so "did this round change anything" is
                    # a sum over the just-materialized blocks instead of
                    # a separate co-partitioned |V| join per round. The
                    # comparison is the exact one the join did —
                    # type-agnostic inequality of this round's label vs
                    # last round's, same rows, same semantics.
                    (final != F.col("prev")).cast("long").alias("chg"),
                )
            )
            live |= set(new_ids)
            # exact, type-agnostic convergence: count labels that changed
            # since the previous round — an aggregate over the cached
            # checkpoint blocks (no extra join, no extra shuffle source)
            changed = compressed.agg(F.sum("chg")).first()[0]
            compressed = compressed.select("id", "label")
            # the new checkpoint is materialized — the superseded round's
            # blocks are dead; free them NOW so round count never
            # translates into executor storage growth
            _unpersist_ids(spark, labels_ids)
            live -= set(labels_ids)
            labels, labels_ids = compressed, new_ids
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_rounds} rounds"
            )
    except BaseException:
        # failure paths must not strand checkpoint blocks in the session
        # (non-convergence, a mid-loop job failure, cancellation)
        _unpersist_ids(spark, live)
        raise
    _unpersist_ids(spark, sym_ids)
    # The FINAL round's blocks stay cached: the returned DataFrame's
    # lineage was truncated to them, so they must live until the caller
    # consumes the result; Spark's ContextCleaner frees them once the
    # caller's reference is garbage collected.
    return labels.withColumnRenamed("label", "component")
