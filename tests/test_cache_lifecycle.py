"""Persist-lifecycle contract (round-8, closing the round-6/7 leak):
registry queries must not pin storage blocks past the call unless they
register a release handle via ``session.register_query_cache`` — and
``clear_query_cache(spark)`` must return the cache to its pre-call
baseline. Mirrors the per-micro-batch assertion in
tests/test_curation_stream.py::test_curation_sink_releases_per_batch_cache.
"""

from __future__ import annotations

from sustainable_building_energy_benchmarking_pipeline_spark.plans.analytics import QUERIES
from sustainable_building_energy_benchmarking_pipeline_spark.session import (
    clear_query_cache,
    register_query_cache,
)


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_z10_z11_pin_nothing(spark, sf_dir):
    """z10/z11 are persist-free since round 8 (the z10 pair stage is a
    single linear pipeline; z11's normalizer reads the distinct-score
    aggregate) — a full run leaves getPersistentRDDs at baseline with
    NO cleanup call."""
    for name in ("z10_winnowing_pairs", "z11_lm_perplexity_tiers"):
        before = _n_cached(spark)
        assert QUERIES[name].fn(spark, sf_dir).count() >= 0
        assert _n_cached(spark) == before, f"{name} leaked a cache entry"


def test_bloom_queries_release_via_handle(spark, sf_dir):
    """z01/z04 persist their bloom-flagged batch (the documented
    single-scan posture) but register it: clear_query_cache() releases
    every pinned block, so a library user looping them over corpus
    shards holds at most one batch's cache at a time."""
    clear_query_cache(spark)
    before = _n_cached(spark)
    for name in ("z01_bloom_incremental_dedup", "z04_sharded_bloom_dedup"):
        assert QUERIES[name].fn(spark, sf_dir).count() >= 0
    released = clear_query_cache(spark)
    assert released >= 2, "bloom queries did not register their caches"
    assert _n_cached(spark) <= before, "clear_query_cache left pinned blocks"


def test_clear_query_cache_idempotent_and_safe(spark, sf_dir):
    """Double-release is a no-op, and a released query still recomputes
    correctly (the handle affects cost posture only, never results)."""
    q = QUERIES["z01_bloom_incremental_dedup"].fn
    n1 = q(spark, sf_dir).count()
    clear_query_cache(spark)
    assert clear_query_cache(spark) == 0
    df = q(spark, sf_dir)
    clear_query_cache(spark)  # release BEFORE the action: must recompute
    assert df.count() == n1


def test_all_persisting_queries_release_via_handle(spark, sf_dir):
    """Every query-layer persist is registered (round-8 sweep: q20's
    two-pass rank frame, q49's IVF assignment, plus the bloom pair):
    after clear_query_cache the storage cache returns to baseline."""
    clear_query_cache(spark)
    before = _n_cached(spark)
    for name in ("q20_percent_rank", "q49_ivf_topk"):
        assert QUERIES[name].fn(spark, sf_dir).count() >= 0
    assert clear_query_cache(spark) >= 2
    assert _n_cached(spark) <= before


def test_register_then_clear_counts(spark):
    df = spark.range(10).persist()
    df.count()
    register_query_cache(df)
    assert clear_query_cache(spark) == 1
