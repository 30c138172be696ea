"""Physical-plan regression gates: catches scale anti-patterns the
moment a refactor reintroduces them, instead of waiting for a 100×
corpus to expose the single task.

The one hard rule here is the W9 lesson (round 1's only perf_weak):
``Window.orderBy(...)`` with no partition key plans as
Exchange SinglePartition → Window, funneling the entire input through
ONE task. Global aggregates and final LIMIT merges legitimately use
SinglePartition (their reduced input is tiny); a Window over it is the
anti-pattern.
"""

from __future__ import annotations

import re

import pytest

from sustainable_building_energy_benchmarking_pipeline_spark.plans.analytics import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _single_partition_window(plan: str) -> bool:
    """True when a Window operator consumes an Exchange SinglePartition
    (scanning upward from each Window line past Sort/Project barriers)."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if re.search(r"\bWindow(Group)?Exec\b|\+- Window |^Window ", line) or (
            "Window " in line and "windowspecdefinition" in line
        ):
            for j in range(i + 1, min(i + 4, len(lines))):
                nxt = lines[j]
                if "Exchange SinglePartition" in nxt:
                    return True
                # anything other than the sort/project feeding the window
                # breaks the chain
                if "Exchange hashpartitioning" in nxt or "Scan" in nxt:
                    break
    return False


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_single_partition_window(spark, name):
    df = QUERIES[name].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not _single_partition_window(plan), (
        f"{name} plans a Window over Exchange SinglePartition — "
        "the whole input funnels through one task; partition the window "
        "or use the two-pass distributed form (operators.windows."
        "distributed_percent_rank)"
    )


# Queries whose plan legitimately contains a BroadcastNestedLoopJoin:
# each crossJoins a SINGLE-ROW broadcast global-stats frame (corpus size,
# global min/max) — a 1×N nested loop is a constant attach, not a join.
_SINGLE_ROW_CROSSJOIN_OK = {
    "q51_bm25_search",        # broadcast 1-row corpus stats
    "q68_value_histogram",    # broadcast 1-row global min/max
    "q77_tfidf_terms",        # broadcast 1-row document count
    "q98_source_mix_weights", # broadcast 1-row mix normalizer
    "z05_temperature_sample", # broadcast 1-row √n normalizer + O(#strata) targets
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_quadratic_joins(spark, name):
    """No registry query may plan a CartesianProduct, and
    BroadcastNestedLoopJoin only for allowlisted single-row constant
    attaches — anything else is the O(|L|·|R|) trap that a range/fuzzy
    predicate silently plans when its equi-join decomposition regresses."""
    df = QUERIES[name].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"
    if name not in _SINGLE_ROW_CROSSJOIN_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a BroadcastNestedLoopJoin on non-trivial inputs — "
            "decompose the predicate into an equi-join (banding, binning, "
            "deletion variants) or broadcast a true single-row frame"
        )
