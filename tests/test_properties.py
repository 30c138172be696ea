"""Property-based invariants (hypothesis) for the operators whose
correctness rests on an algorithmic argument rather than a fixture:
union-find closure, the SymSpell edit-distance decomposition, and text
fingerprint normalization. Driver-side properties run hundreds of
examples; the one Spark-backed property keeps max_examples small (a
Spark job per example)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sustainable_building_energy_benchmarking_pipeline_spark.operators.dedup import (
    _union_find_components,
)

# ---------------------------------------------------------------------------
# union-find == brute-force transitive closure, min-id representative
# ---------------------------------------------------------------------------

pairs_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)), max_size=60
)


def _brute_components(pairs):
    nodes = {x for p in pairs for x in p}
    comp = {x: {x} for x in nodes}
    changed = True
    while changed:
        changed = False
        for a, b in pairs:
            if comp[a] is not comp[b]:
                comp[a] |= comp[b]
                for x in comp[b]:
                    comp[x] = comp[a]
                changed = True
    return {x: min(comp[x]) for x in nodes}


@given(pairs_strategy)
@settings(max_examples=200, deadline=None)
def test_union_find_matches_transitive_closure(pairs):
    assert _union_find_components(pairs) == _brute_components(pairs)


# ---------------------------------------------------------------------------
# SymSpell decomposition == levenshtein <= 1 (Spark-backed, few examples)
# ---------------------------------------------------------------------------

words = st.lists(
    st.text(alphabet="abc", min_size=0, max_size=4), min_size=1, max_size=8,
    unique=True,
)


@given(left=words, right=words)
@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fuzzy_ed1_equals_naive_levenshtein(spark_session_prop, left, right):
    from sustainable_building_energy_benchmarking_pipeline_spark.operators.joins import (
        fuzzy_join_ed1,
    )

    spark = spark_session_prop
    L = spark.createDataFrame([(w,) for w in left], "k string")
    R = spark.createDataFrame([(w,) for w in right], "k string")
    got = {
        (r.left_key, r.right_key, r.dist)
        for r in fuzzy_join_ed1(L, R, "k", "k").collect()
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (a, b, lev(a, b)) for a in left for b in right if lev(a, b) <= 1
    }
    assert got == want


import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_session_prop(spark):
    return spark
