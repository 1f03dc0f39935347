"""Physical-plan walking helpers shared by the plan-lint gates.

These poke the JVM plan tree through py4j: unwrap AQE wrappers
(AdaptiveSparkPlan / QueryStage / ReusedExchange) so traversal reaches
the materialized subtrees and their runtime SQL metrics.
"""

from __future__ import annotations


def final_plan(df):
    """The executed physical plan, unwrapped past AdaptiveSparkPlan."""
    plan = df._jdf.queryExecution().executedPlan()
    if "AdaptiveSparkPlan" in plan.nodeName():
        plan = plan.executedPlan()
    return plan


def walk(node):
    """Depth-first walk that follows AQE stage / reused-exchange links."""
    yield node
    name = node.nodeName()
    if "AdaptiveSparkPlan" in name:
        yield from walk(node.executedPlan())
        return
    if "QueryStage" in name:
        yield from walk(node.plan())
        return
    if "ReusedExchange" in name:
        # leaf that aliases another exchange — follow it for the metric
        yield from walk(node.child())
        return
    children = node.children()
    for i in range(children.size()):
        yield from walk(children.apply(i))


def num_output_rows(node):
    """First numOutputRows metric found in this subtree, else None."""
    for n in walk(node):
        opt = n.metrics().get("numOutputRows")
        if opt.isDefined():
            v = opt.get().value()
            if v >= 0:
                return v
    return None


def broadcast_join_builds(df):
    """For every Broadcast*Join in the executed plan, return
    (join_node_name, build_rows) where build_rows is the runtime
    numOutputRows of the join's broadcast-exchange BUILD side (None when
    the metric is absent). The build side is the child whose subtree
    contains the BroadcastExchange; this is what actually lands in
    executor memory, so it — not the min() of the two inputs — is the
    thing a scale lint must bound (round-9 verdict directive #3)."""
    out = []
    for node in walk(final_plan(df)):
        name = node.nodeName()
        if "BroadcastHashJoin" not in name and "BroadcastNestedLoopJoin" not in name:
            continue
        # The join exec's own buildSide picks the child; searching both
        # subtrees would mis-attribute a NESTED join's exchange on the
        # streamed side to this join's build.
        try:
            idx = 0 if "BuildLeft" in node.buildSide().toString() else 1
        except Exception:
            idx = None
        build_rows = None
        children = node.children()
        order = [idx] if idx is not None else list(range(children.size()))
        for i in order:
            child = children.apply(i)
            for n in walk(child):
                if "BroadcastExchange" in n.nodeName():
                    build_rows = num_output_rows(n)
                    break
            if build_rows is not None:
                break
        out.append((name, build_rows))
    return out


def cartesian_min_side(df):
    """Max over CartesianProduct nodes of the smaller input's runtime
    rows (None if no cartesian product survived optimization)."""
    worst = None
    for node in walk(final_plan(df)):
        if "CartesianProduct" not in node.nodeName():
            continue
        children = node.children()
        sides = []
        for i in range(children.size()):
            rows = num_output_rows(children.apply(i))
            if rows is not None:
                sides.append(rows)
        if sides:
            small = min(sides)
            worst = small if worst is None else max(worst, small)
    return worst
