"""Opt-in 10× stress tests (set SPARK_GRAFT_STRESS=1): replicate the
sf0.1 tables to ~10× rows in a temp dir and drive the heavy operator
families end-to-end. These are the "would it survive a scale-up"
rehearsals behind the round-4 Arrow-transfer and bucket-cap work —
too slow for the default suite (minutes), kept runnable on demand.

Replica construction notes:
- documents: per-replica suffix keeps each replica's internal near-dup
  structure while making replicas near-dup OF EACH OTHER (3-gram sets
  differ by ~2 shingles) — a duplicate-heavy corpus, the adversarial
  posture for dedup_clusters' driver closure;
- events: ids/users shifted into disjoint ranges — 10× independent
  streams, the benign posture where window work shards cleanly.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from sustainable_building_energy_benchmarking_pipeline_spark.session import load_table

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_STRESS") != "1",
    reason="10x stress suite is opt-in: SPARK_GRAFT_STRESS=1",
)

SF_DIR = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def docs10x(spark, tmp_path_factory):
    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path_factory.mktemp("stress") / "docs10x.parquet")
    reps = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" replica{i}")).alias("text"),
            "lang", "source", "n_chars",
        )
        for i in range(10)
    ]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    big.write.parquet(path)
    return spark.read.parquet(path)


def test_dedup_clusters_10x_duplicate_heavy(docs10x):
    """~50k docs where every doc has ~10 near-identical replicas: the
    pair graph is ~1000× the base corpus's. Must complete in bounded
    time via the driver closure (pairs ≪ gate) and label every doc."""
    from sustainable_building_energy_benchmarking_pipeline_spark.operators.dedup import dedup_clusters

    t0 = time.perf_counter()
    out = dedup_clusters(docs10x, threshold=0.5, num_hashes=32, bands=16)
    n = out.count()
    elapsed = time.perf_counter() - t0
    assert n == docs10x.count()
    assert elapsed < 120, f"10x dedup_clusters took {elapsed:.0f}s"
    # replicas of one base doc must collapse into one cluster
    reps = out.filter("is_rep").count()
    assert reps < n / 5, f"only {n - reps} docs deduplicated of {n}"


def test_minhash_pairs_10x_bounded(docs10x):
    from sustainable_building_energy_benchmarking_pipeline_spark.operators.dedup import (
        minhash_near_duplicates,
    )

    t0 = time.perf_counter()
    n_pairs = minhash_near_duplicates(
        docs10x, threshold=0.5, num_hashes=32, bands=16, persist_shingles=False
    ).count()
    elapsed = time.perf_counter() - t0
    assert n_pairs > 0
    assert elapsed < 60, f"10x minhash took {elapsed:.0f}s"


@pytest.fixture(scope="module")
def sf10x_dir(docs10x, tmp_path_factory):
    """A 10× sf-layout dir: the duplicate-heavy docs10x stands in for
    documents.parquet, every other table symlinks to sf0.1 — so the
    REGISTRY queries (which take (spark, sf_dir)) run unmodified on 10×
    corpus input."""
    root = tmp_path_factory.mktemp("sf10x")
    docs10x.write.parquet(str(root / "documents.parquet"))
    for name in os.listdir(SF_DIR):
        if name != "documents.parquet":
            os.symlink(os.path.join(SF_DIR, name), str(root / name))
    return str(root)


@pytest.mark.parametrize(
    "name,bound_sec",
    [
        ("z02_heavy_hitters", 90),
        ("z04_sharded_bloom_dedup", 120),
        ("z10_winnowing_pairs", 150),
        ("z11_lm_perplexity_tiers", 120),
        # round-12: chunking is map-only — its 10× cost must stay
        # linear in corpus tokens (the explode's output multiplier)
        ("z20_chunk_overlap", 90),
        # round-12: the duplicate-heavy 10× corpus multiplies the
        # SHARED-gram mass ~100×, but the self-join fan-out stays
        # bounded by |sources| per gram — the exact shape z22's
        # distinct-before-join exists for
        ("z22_source_overlap", 150),
    ],
)
def test_z_tail_10x_bounded(spark, sf10x_dir, name, bound_sec):
    """Round-9 directive #6: the ≥1 s z-tail gets its own 10× receipt.
    Each query must complete on the duplicate-heavy 10× corpus within
    a fixed wall bound and return a sane row count — z10's pair stage
    in particular faces ~100× the near-dup pair mass here, the exact
    shape its common-fingerprint suppression (df>50) exists to bound."""
    from sustainable_building_energy_benchmarking_pipeline_spark.plans.analytics import QUERIES

    fn = QUERIES[name].fn
    t0 = time.perf_counter()
    n = fn(spark, sf10x_dir).count()
    elapsed = time.perf_counter() - t0
    assert n >= 0
    assert elapsed < bound_sec, f"10x {name} took {elapsed:.0f}s (> {bound_sec}s)"
    spark.catalog.clearCache()  # z04/z10 register persists per pass


def test_semdedup_mega_cluster_10x(spark, tmp_path_factory):
    """Round-10 directive: ALL vectors in ONE cluster at 10× scale —
    the adversarial shape the triangular chunking exists for. 20k
    64-dim vectors in a single cluster is a 4·10⁸-float full sims
    matrix (~3.2 GB); the chunked kernel must stay under the fixed
    float budget (more passes, not more memory) and finish."""
    from sustainable_building_energy_benchmarking_pipeline_spark.operators.dedup import (
        semdedup_prune,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    reps = [
        emb.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            "embedding",
        )
        for i in range(10)
    ]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    path = str(tmp_path_factory.mktemp("stress") / "emb10x.parquet")
    big.write.parquet(path)
    big = spark.read.parquet(path)
    n = big.count()
    t0 = time.perf_counter()
    kept = semdedup_prune(big, threshold=0.35, n_clusters=1).count()
    elapsed = time.perf_counter() - t0
    # replicas are exact duplicates of each other: at most one replica
    # family survivor set remains, and the earliest copy always survives
    assert 0 < kept <= n // 10
    assert elapsed < 600, f"mega-cluster semdedup took {elapsed:.0f}s"
