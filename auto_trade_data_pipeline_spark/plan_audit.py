"""Physical-plan audits — scale-killer detection as assertions.

``tests/test_plans.py`` pins per-query plan recipes (pushdown,
broadcast, no-SinglePartition rank paths). This module adds the
corpus-wide sweep the round-5 verdict asked for: a walker that finds
every ``WindowExec`` evaluated without a partition spec (Spark funnels
the whole input through ONE task for such windows) and fails unless
the window's input is visibly row-count-bounded in the same plan.

Whitelist rule (the verdict's): a SinglePartition window is
acceptable only when its input subtree contains an aggregate or a
limit — the corpus uses such windows exclusively over dimension-sized
aggregates (24-row hourly profiles, 10-bin histograms, per-fold
report rows), which stay dimension-sized at any data scale. A
SinglePartition window whose subtree is scan→project→window would
serialize the full table through one task at 100 TB — that is the
shape this audit refuses.

This is a heuristic bound, not a proof: an aggregate below the window
bounds rows only if its grouping keys are dimension-like. The pinned
per-query assertions in tests/test_plans.py carry the exact contracts;
this sweep is the corpus-wide backstop that keeps NEW queries from
quietly introducing the scan-shaped variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Node classes that bound the row count of everything above them.
_BOUNDING = frozenset(
    {
        "HashAggregateExec",
        "ObjectHashAggregateExec",
        "SortAggregateExec",
        "AggregateInPandasExec",
        "CollectLimitExec",
        "GlobalLimitExec",
        "LocalLimitExec",
        "TakeOrderedAndProjectExec",
        "LocalTableScanExec",
    }
)

_WINDOW_NODES = frozenset({"WindowExec", "WindowInPandasExec", "WindowGroupLimitExec"})


def _walk(jplan):
    yield jplan
    children = jplan.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i))


def unbounded_single_partition_windows(df: DataFrame) -> list[str]:
    """Return the node names of every window in ``df``'s physical plan
    that (a) has an EMPTY partition spec — Spark plans Exchange
    SinglePartition under it — and (b) has no aggregate/limit below it
    in the same plan to bound its input row count. Empty list = plan
    is clean under the whitelist rule."""
    plan = df._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.initialPlan()
    offenders: list[str] = []
    for node in _walk(plan):
        name = node.getClass().getSimpleName()
        if name in _WINDOW_NODES and node.partitionSpec().isEmpty():
            subtree = {n.getClass().getSimpleName() for n in _walk(node)}
            if not (subtree & _BOUNDING):
                offenders.append(name)
    return offenders
