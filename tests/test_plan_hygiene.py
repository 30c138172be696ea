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


# Queries whose single-partition window input is aggregate OUTPUT
# bounded by a VALUE DOMAIN (not by corpus row count) — the one task
# holds at most |domain| tiny rows at any scale, while the raw table
# never meets a window. Mirror of _TINY_INPUT_ENUM_WINDOW_OK below;
# every entry needs the boundedness argument in the query docstring.
_TINY_INPUT_GLOBAL_WINDOW_OK = {
    # running sum over DISTINCT 6-dp-rounded nll scores (bounded by the
    # score decimal domain — nll concentrates in a few nats); the corpus
    # itself is aggregated twice before this frame exists
    "z11_lm_perplexity_tiers",
    # UniMax waterfall windows over the per-LANGUAGE token aggregate —
    # bounded by language cardinality (an enum domain); the corpus is
    # consumed by one map-side-combined aggregate before any window
    "z21_unimax_budget",
    # KS cumulative over the per-LENGTH corpus aggregate — bounded by
    # the length value domain; the corpus is consumed by one
    # (source, length) aggregate before any window
    "z23_length_drift",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_single_partition_window(spark, name):
    df = QUERIES[name].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if name in _TINY_INPUT_GLOBAL_WINDOW_OK:
        # weaker targeted gate instead of a skip (round-7 advice): each
        # single-partition window must consume AGGREGATE output — an
        # aggregate appears in its child chain before any scan. A
        # refactor that re-points the window at the raw corpus would
        # pass a skip silently.
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "Window " not in line and "WindowExec" not in line:
                continue
            ok = False
            for nxt in lines[i + 1 :]:
                if re.search(r"(Hash|Sort|Object.*)Aggregate", nxt):
                    ok = True
                    break
                if "Scan" in nxt:
                    break
            assert ok, (
                f"{name} is allowlisted for a value-domain-bounded "
                "global window but the window's input chain reaches a "
                "scan before any aggregate — the boundedness argument "
                "no longer holds"
            )
        return
    assert not _single_partition_window(plan), (
        f"{name} plans a Window over Exchange SinglePartition — "
        "the whole input funnels through one task; partition the window, "
        "use the two-pass distributed form (operators.windows."
        "distributed_percent_rank / stratified_cumsum), or — ONLY if the "
        "window input is a provably value-domain-bounded aggregate — "
        "annotate it in _TINY_INPUT_GLOBAL_WINDOW_OK with justification"
    )


# --- skewed-stratum window gate (round 6) -------------------------------
#
# The q53/z05 lesson: a Window whose ENTIRE partition key is a fixed-
# cardinality enum (lang, event_type, o_orderstatus, ...) is the
# single-partition anti-pattern reappearing via skew — a window
# partition cannot be split across tasks, so the dominant enum value
# (≈half a 100 TB crawl for `lang='en'`) ranks in ONE task no matter
# how many executors exist. Composite keys that include a scaling
# column (_pid, _mb, user_id, zone...) are fine; windows over TINY
# aggregates are fine but must be annotated below.

# enum-typed columns in the test tables (and their direct derivations)
# whose cardinality does NOT grow with data volume
_ENUM_COLS = {
    "lang",
    "event_type",
    "prev_type",
    "curr_type",
    "o_orderstatus",
    "o_orderpriority",
    "l_returnflag",
    "l_linestatus",
    "l_shipmode",
    "c_mktsegment",
    "r_name",
    "n_name",
    "label",
    "source",
}

# Queries whose enum-partitioned window is over a PROVABLY tiny input
# (a prior aggregate bounded by enum-cardinality²), with justification:
_TINY_INPUT_ENUM_WINDOW_OK = {
    "q83_event_transitions",  # normalizer over the ≤25-row prev→curr aggregate
    "q87_wow_growth",         # lag over the ~#types×#weeks weekly aggregate
    # per-source KS cumulative over the support GRID — an aggregate
    # bounded by |sources| × |length domain|, never the corpus
    "z23_length_drift",
}

_WINDOW_LINE = re.compile(r"\bWindow \[.*\], \[([^\[\]]*)\], \[[^\[\]]*\]")
_GROUP_LIMIT_PARTIAL = re.compile(r"\bWindowGroupLimit \[([^\[\]]*)\],.*Partial")
_ATTR = re.compile(r"(\w+)#\d+")


def _enum_only_windows(plan: str) -> list[str]:
    """Partition specs of Window operators whose partition columns are
    ALL fixed-cardinality enums (empty list = plan is skew-clean).

    A Window fed by a PARTIAL ``WindowGroupLimit`` (Spark's rank-limit
    pushdown for ``row_number() <= k`` filters) is exempt: each map task
    forwards only its local top-k per group, so the reduce-side window
    input is bounded by k × map-partitions regardless of skew."""
    pushed = {
        frozenset(_ATTR.findall(m.group(1)))
        for m in _GROUP_LIMIT_PARTIAL.finditer(plan)
    }
    hits = []
    for line in plan.splitlines():
        m = _WINDOW_LINE.search(line)
        if not m:
            continue
        cols = _ATTR.findall(m.group(1))
        if (
            cols
            and all(c in _ENUM_COLS for c in cols)
            and frozenset(cols) not in pushed
        ):
            hits.append(", ".join(cols))
    return hits


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_skewed_enum_window(spark, name):
    if name in _TINY_INPUT_ENUM_WINDOW_OK:
        pytest.skip("annotated tiny-aggregate enum window")
    df = QUERIES[name].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    hits = _enum_only_windows(plan)
    assert not hits, (
        f"{name} plans a Window partitioned ONLY by fixed-cardinality "
        f"enum column(s) {hits} — the dominant value funnels through one "
        "task at scale. Use operators.windows.stratified_rank/"
        "stratified_cumsum, an aggregation-based top-k (q92/q93 shape), "
        "or a frame-overlap partition split (q95 shape); if the window "
        "input is a provably tiny aggregate, annotate it in "
        "_TINY_INPUT_ENUM_WINDOW_OK with justification."
    )


def test_skew_gate_catches_full_table_enum_rank(spark):
    """Seeded regression: z05's ORIGINAL window form — a full-table
    per-lang row_number whose limit is data-dependent (so rank-limit
    pushdown CANNOT bound it) — must be flagged by the detector."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    w = Window.partitionBy("lang").orderBy(
        F.sha2(F.col("doc_id").cast("string"), 256), F.asc("doc_id")
    )
    bad = docs.withColumn("_rk", F.row_number().over(w))
    plan = bad._jdf.queryExecution().executedPlan().toString()
    assert _enum_only_windows(plan), (
        "detector failed to flag a full-table enum-partitioned window"
    )


def test_skew_gate_exempts_rank_limit_pushdown(spark):
    """A constant ``row_number() <= k`` filter plans a Partial
    WindowGroupLimit — bounded reduce input, must NOT be flagged."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    w = Window.partitionBy("lang").orderBy("doc_id")
    ok = docs.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= 3)
    plan = ok._jdf.queryExecution().executedPlan().toString()
    assert not _enum_only_windows(plan)


# Queries whose plan legitimately contains a BroadcastNestedLoopJoin:
# each crossJoins a SINGLE-ROW broadcast global-stats frame (corpus size,
# global min/max) — a 1×N nested loop is a constant attach, not a join.
_SINGLE_ROW_CROSSJOIN_OK = {
    "q51_bm25_search",        # broadcast 1-row corpus stats
    "q68_value_histogram",    # broadcast 1-row global min/max
    "q77_tfidf_terms",        # broadcast 1-row document count
    "q98_source_mix_weights", # broadcast 1-row mix normalizer
    "z05_temperature_sample", # broadcast 1-row √n normalizer + O(#strata) targets
    "z11_lm_perplexity_tiers", # broadcast 1-row corpus total / doc count / terciles
    "z12_source_kl_drift",    # broadcast 1-row corpus token total
    "z13_dsir_importance",    # broadcast 1-row target/raw totals onto 256 buckets
    "z21_unimax_budget",      # broadcast 1-row total-budget + pivot attaches
    "z23_length_drift",       # length-support grid (|sources|x|len domain| aggregate frames) + 1-row n_all
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
