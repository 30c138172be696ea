"""Superlinearity tripwire: the heavy dedup/similarity family must scale
near-linearly with corpus size. sf0.01 → sf0.1 is 10× the data; a query
whose wall-time ratio exceeds ~15 (n·log n headroom + scheduler noise)
has regressed to a quadratic plan somewhere (pair join, mega-bucket
explosion, un-blocked candidate generation) and would not survive 100 TB.

Method: per sf, per query, MIN of 3 runs after one warm-up action on the
session (single-shot timings vary ±50% on a shared box — see the bench
protocol note in bench.py). The bound is deliberately loose: this is a
tripwire for O(n²), not a performance regression test.
"""

from __future__ import annotations

import time

import pytest

from tests.conftest import long_suite

pytestmark = long_suite

from sustainable_building_energy_benchmarking_pipeline_spark.plans.analytics import QUERIES

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"

HEAVY = [
    "q32_jaccard_neardup",
    "q33_minhash_neardup",
    "q34_simhash_neardup",
    "q50_dedup_clusters",
    "q61_decontaminate",
    "q67_fuzzy_name_match",
    "q77_tfidf_terms",
    "q97_boilerplate_ngrams",
    "z01_bloom_incremental_dedup",
    "z02_heavy_hitters",
    "z03_deterministic_shuffle",
    "z04_sharded_bloom_dedup",
    "z10_winnowing_pairs",
    "z11_lm_perplexity_tiers",
    "z15_semdedup",
    "z18_dup_ngram_spans",
    "z19_exact_substr_cut",
    "z20_chunk_overlap",
    "z22_source_overlap",
]

MAX_RATIO = 15.0


def _min_time(fn, runs: int = 3) -> float:
    from sustainable_building_energy_benchmarking_pipeline_spark.operators import dedup

    best = float("inf")
    for _ in range(runs):
        # the scaling tripwire exists to catch superlinear CLUSTERING
        # cost — a memo hit would measure the label projection instead,
        # making the ratio vacuous (q50 measured 0.11 s memoized vs
        # ~1.5 s real). Cold per run, like bench.py's per-query pinning.
        dedup.clear_cluster_label_cache()
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


@pytest.mark.parametrize("name", HEAVY)
def test_near_linear_scaling(spark, name):
    fn = QUERIES[name].fn
    fn(spark, SF_SMALL).count()  # warm-up: JIT, codegen, file listing
    t_small = _min_time(lambda: fn(spark, SF_SMALL).count())
    t_big = _min_time(lambda: fn(spark, SF_BIG).count())
    # sub-50ms denominators are scheduler floor, not data work; clamp so
    # the ratio measures scaling, not fixed overhead amortization
    ratio = t_big / max(t_small, 0.05)
    assert ratio < MAX_RATIO, (
        f"{name}: {t_small:.3f}s @ sf0.01 -> {t_big:.3f}s @ sf0.1 "
        f"(x{ratio:.1f} for 10x data) — superlinear, plan has a quadratic stage"
    )
