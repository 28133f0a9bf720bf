"""Plan observability: extract the scale-relevant shape of a physical
plan as numbers — so tests can pin an EXCHANGE BUDGET per query instead
of grepping strings ad hoc. A new join or window that silently adds a
shuffle to a hot query is exactly the regression that only shows up at
100 TB; pinning the count catches it at sf0.001.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_stats(df: DataFrame) -> dict:
    """Counts of the plan nodes that dominate cost at scale:

    - ``exchanges``: shuffle exchanges (NOT broadcast — those are the
      cheap kind when the side is small)
    - ``broadcasts``: broadcast exchanges
    - ``single_partition``: Exchange SinglePartition occurrences (the
      100 TB killer when fed by an unbounded input; final-aggregate
      single rows are fine — judge by the count you pin)
    - ``python_nodes``: Arrow/Python evaluation nodes (MapInPandas,
      ArrowEvalPython, FlatMapGroupsInPandas...) — the deliberate slow
      path; pin so one never sneaks into a JVM-only query
    - ``codegen_spans``: WholeStageCodegen regions (bigger spans = more
      of the tree fused)
    - ``scans``: FileScan sources
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": len(re.findall(r"Exchange (?!SinglePartition)(?:hashpartitioning|rangepartitioning|RoundRobinPartitioning)", plan))
        + len(re.findall(r"Exchange SinglePartition", plan)),
        "broadcasts": plan.count("BroadcastExchange"),
        "single_partition": plan.count("Exchange SinglePartition"),
        "python_nodes": sum(
            plan.count(n)
            for n in ("MapInPandas", "ArrowEvalPython", "FlatMapGroupsInPandas", "BatchEvalPython")
        ),
        # codegen regions render as "*(N) Node" prefixes — and only once
        # AQE has FINALIZED the plan (pre-execution adaptive plans show
        # none), so treat this field as informational, not budgetable
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "scans": plan.count("FileScan"),
    }
