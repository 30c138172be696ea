"""Sketch operators for 100 TB training-data pipelines: a distributed
Bloom filter (the incremental cross-run dedup primitive) and exact heavy
hitters through a mergeable frequent-items sketch.

Scale design:
- The Bloom filter is built with ONE pass over the corpus — per-partition
  bitmaps OR-combined — and shipped as a broadcast of a few MB, so an
  incremental batch can be deduped against billions of historical keys
  without joining the history at all for the (overwhelming) majority of
  definitely-new rows; only bloom-positive rows reach the exact join.
- Heavy hitters uses Spark's built-in ``approx_top_k`` (DataSketches
  frequent-items, JVM-side, mergeable, one shuffle of sketch bytes) for
  candidates, then recounts ONLY the candidate set exactly — never a full
  groupBy over all distinct values.

No equivalent exists in the reference pipeline (its pandas scale never
needs them); these are the engine-native additions for corpus-scale work,
alongside operators/dedup.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# two fixed xxhash64 seeds -> double hashing h_i = h1 + i*h2 (Kirsch &
# Mitzenmacher: k independent-enough probe positions from two hashes)
_SEED_A = 0x51_7CC1B7
_SEED_B = 0x2545F491


@dataclass(frozen=True)
class BloomFilter:
    """Immutable Bloom filter state: ``m`` bits in a packed bytearray,
    ``k`` probes per key. Positions come from Spark-side xxhash64 pairs,
    so build and membership agree across JVM/Python and across runs."""

    bits: bytes
    m: int
    k: int

    @property
    def fill_ratio(self) -> float:
        arr = np.frombuffer(self.bits, dtype=np.uint8)
        return float(np.unpackbits(arr).sum()) / self.m

    def contains(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Vectorized membership for arrays of the two base hashes."""
        arr = np.frombuffer(self.bits, dtype=np.uint8)
        m = np.uint64(self.m)
        out = np.ones(len(h1), dtype=bool)
        a = h1.astype(np.int64).view(np.uint64)
        b = h2.astype(np.int64).view(np.uint64)
        for i in range(self.k):
            pos = (a + np.uint64(i) * b) % m
            out &= (arr[(pos >> np.uint64(3)).astype(np.int64)]
                    >> (pos & np.uint64(7)).astype(np.uint8)) & 1 == 1
        return out


def _hash_pair(col: Column) -> tuple[Column, Column]:
    """The two JVM-side base hashes; strings/ints/binary all hash
    natively. Null keys hash like any other value (a dedicated slot)."""
    return F.xxhash64(col, F.lit(_SEED_A)), F.xxhash64(col, F.lit(_SEED_B))


def build_bloom(
    df: DataFrame,
    col: str,
    expected_items: int | None = None,
    fp_rate: float = 0.01,
    tree_combine: bool | None = None,
) -> BloomFilter:
    """One-pass distributed Bloom filter over ``df[col]``.

    Sizing: m = -n·ln(p)/ln(2)², k = (m/n)·ln(2) — the textbook optimum.
    Each partition builds a local m-bit bitmap from JVM-computed hash
    pairs (Python only does vectorized modular arithmetic) and yields
    one binary row; the bitmaps then TREE-combine — an executor-side
    grouped OR reduces P partition bitmaps to ≤64 group bitmaps before
    the driver ORs those — so driver transfer is ≤64·m/8 bytes no
    matter how many input partitions exist (a flat per-partition collect
    would ship P·m/8: gigabytes at 100 TB partition counts). OR is
    associative; add combine levels if 64 groups ever overwhelm one
    executor's task.
    """
    if expected_items is None:
        expected_items = df.count()
    n = max(1, expected_items)
    m = max(64, int(math.ceil(-n * math.log(fp_rate) / (math.log(2) ** 2))))
    m = (m + 7) // 8 * 8  # whole bytes
    k = max(1, round(m / n * math.log(2)))
    m8 = m // 8
    mm = np.uint64(m)
    kk = k

    h1, h2 = _hash_pair(F.col(col))
    hashed = df.select(h1.alias("_h1"), h2.alias("_h2"))

    def _partition_bitmap(it):
        local = np.zeros(m8, dtype=np.uint8)
        bit_lut = (np.uint8(1) << np.arange(8, dtype=np.uint8))
        for pdf in it:
            a = pdf["_h1"].to_numpy(np.int64).view(np.uint64)
            b = pdf["_h2"].to_numpy(np.int64).view(np.uint64)
            for i in range(kk):
                pos = (a + np.uint64(i) * b) % mm
                np.bitwise_or.at(
                    local,
                    (pos >> np.uint64(3)).astype(np.int64),
                    bit_lut[(pos & np.uint64(7)).astype(np.int64)],
                )
        yield pd.DataFrame({"bits": [local.tobytes()]})

    def _or_group(pdfs):
        acc_ = np.zeros(m8, dtype=np.uint8)
        for pdf in pdfs:
            for b in pdf["bits"]:
                acc_ |= np.frombuffer(b, dtype=np.uint8)
        yield pd.DataFrame({"bits": [acc_.tobytes()]})

    bitmaps = hashed.mapInPandas(_partition_bitmap, "bits binary")
    # partition-count gate: ≤64 partitions → the direct collect ships
    # ≤64 bitmaps and the combine shuffle would only add a stage; beyond
    # that, tree-combine first. The estimate uses the scan's file list +
    # default parallelism — cheap plan metadata. (`.rdd.getNumPartitions`
    # would be exact but under AQE it EXECUTES the upstream shuffle
    # stages to finalize the plan, doubling the pipeline.) Erring low on
    # an exchange-heavy input only costs a bigger direct collect; at
    # genuine cluster scale the file count dominates and gates correctly.
    if tree_combine is None:
        try:
            est_parts = len(hashed.inputFiles())
        except Exception:
            est_parts = 0
        est_parts = max(
            est_parts, df.sparkSession.sparkContext.defaultParallelism
        )
        tree_combine = est_parts > 64
    if tree_combine:
        bitmaps = (
            bitmaps.repartition(64, F.spark_partition_id() % 64)
            .mapInPandas(_or_group, "bits binary")
        )
    parts = bitmaps.collect()
    acc = np.zeros(m8, dtype=np.uint8)
    for row in parts:
        acc |= np.frombuffer(row["bits"], dtype=np.uint8)
    return BloomFilter(bits=acc.tobytes(), m=m, k=k)


# Broadcast-handle cache: one Spark broadcast per (filter, application),
# keyed weakly on the BloomFilter so repeated membership calls in a
# long-lived session (per-micro-batch incremental dedup) reuse ONE
# broadcast instead of pinning a fresh megabyte-scale copy each call;
# when the filter object is dropped, the entry (and its py4j handle)
# becomes collectable.
import weakref

_BC_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def bloom_membership(df: DataFrame, col: str, bloom: BloomFilter) -> DataFrame:
    """``df`` plus a boolean ``_bloom_hit`` column. The filter bytes ride
    a real Spark broadcast (one copy per executor, not per task — and one
    per filter per application, cached, not one per call); the Python
    side is a vectorized Pandas UDF over the two JVM hashes."""
    sc = df.sparkSession.sparkContext
    per_app = _BC_CACHE.setdefault(bloom, {})
    bc = per_app.get(sc.applicationId)
    if bc is None:
        bc = sc.broadcast((bloom.bits, bloom.m, bloom.k))
        per_app[sc.applicationId] = bc

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _member(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bits, m, k = bc.value
        bf = BloomFilter(bits=bits, m=m, k=k)
        return pd.Series(bf.contains(h1.to_numpy(np.int64), h2.to_numpy(np.int64)))

    a, b = _hash_pair(F.col(col))
    return df.withColumn("_bloom_hit", _member(a, b))


def bloom_incremental_dedup(
    history: DataFrame,
    batch: DataFrame,
    col: str,
    bloom: BloomFilter | None = None,
    expected_items: int | None = None,
) -> DataFrame:
    """EXACT incremental dedup of ``batch`` against ``history`` with a
    Bloom pre-filter: the deterministic keep-set (batch keys absent from
    history) of an anti-join, at a fraction of its cost.

    Shape: bloom-negative rows are DEFINITELY new — no false negatives —
    and skip the join entirely; only the bloom-positive sliver (true
    dups + ~fp_rate of the new rows) is anti-joined against history.
    With 1% FP and a mostly-new batch, the join input shrinks ~100×;
    the history side still prunes/pushes down normally. Result equality
    with the plain anti-join is independent of the filter's FP rate —
    the bloom only routes rows, never decides them.

    Pass a prebuilt ``bloom`` (e.g. maintained across a run ledger) or
    let it build one from ``history``; ``expected_items`` is the filter's
    capacity plan — production incremental dedup knows its history size,
    so passing it skips the sizing count job (over-capacity only lowers
    the FP rate below nominal, never correctness).

    Cost note: the two output branches (definitely-new, verified-new)
    each evaluate the membership subtree, so the batch is scanned twice
    — still the winning trade against anti-joining the FULL batch into
    the history shuffle; a caller looping many consumers over the result
    should persist it (or the flagged frame) once.
    """
    if bloom is None:
        bloom = build_bloom(history, col, expected_items=expected_items)
    flagged = bloom_membership(batch, col, bloom)
    definitely_new = flagged.filter(~F.col("_bloom_hit")).drop("_bloom_hit")
    maybe_dup = flagged.filter(F.col("_bloom_hit")).drop("_bloom_hit")
    verified_new = maybe_dup.join(
        history.select(F.col(col)).distinct(), on=col, how="left_anti"
    )
    return definitely_new.unionByName(verified_new)


def heavy_hitters(
    df: DataFrame, col: str, k: int = 20, max_items_tracked: int = 4096
) -> DataFrame:
    """EXACT top-``k`` most frequent values of ``df[col]`` (nulls
    included, like a plain group-by) without a full distinct-value
    aggregation — or a driver-side ValueError when exactness cannot be
    PROVEN. ``approx_top_k`` (DataSketches frequent-items — one pass,
    mergeable sketch bytes on the shuffle) is asked for its FULL tracked
    set (``max_items_tracked`` items, not just k): the sketch guarantees
    any value absent from that set has true count ≤ ε·N with
    ε ≈ 3.5/max_items_tracked, so after exactly recounting the candidate
    set, ``k-th exact count > ε·N`` PROVES no omitted value could belong
    in the top-k — that is the exact-or-raise guard, checked on the
    driver (an in-plan assert_true was tried and gets pruned by AQE's
    empty-side join elimination). Output: (value, cnt), count-desc /
    value-asc.

    Scale: exactly two passes over the data — (sketch + total count) in
    one aggregate job, then a recount scan filtered to the candidate
    values (≤ max_items_tracked literals, pushed into the scan);
    distinct-value cardinality never hits a shuffle. The driver holds
    only the candidate list and the final k rows, both bounded."""
    probe = df.agg(
        F.expr(
            f"approx_top_k({col}, {max_items_tracked}, {max_items_tracked})"
        ).alias("tk"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    cand_items = [r["item"] for r in (probe["tk"] or [])]
    n_total = probe["n"]
    # the sketch returns only values it still tracks — on a flat
    # distribution past capacity that can be (near) nothing
    if len(cand_items) < k:
        raise ValueError(
            f"heavy_hitters: the frequent-items sketch nominated only "
            f"{len(cand_items)} candidates for top-{k} — the k-th value "
            f"sits inside the sketch error bound; raise "
            f"max_items_tracked (= {max_items_tracked}) for an exact answer"
        )
    # NULL is a real group (approx_top_k tracks it as item=None) but
    # isin() can never match null — recount it via an explicit isNull arm
    non_null = [v for v in cand_items if v is not None]
    cond = F.col(col).isin(non_null) if non_null else F.lit(False)
    if len(non_null) < len(cand_items):
        cond = cond | F.col(col).isNull()
    top = (
        df.filter(cond)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(col))
        .limit(k)
        .collect()
    )
    min_cnt = min(r["cnt"] for r in top)
    if min_cnt <= 3.5 * n_total / max_items_tracked:
        raise ValueError(
            "heavy_hitters: k-th count is within the sketch error bound — "
            f"raise max_items_tracked (= {max_items_tracked}) for an exact answer"
        )
    spark = df.sparkSession
    return spark.createDataFrame(
        [(r[col], r["cnt"]) for r in top], f"{col} {dict(df.dtypes)[col]}, cnt bigint"
    ).orderBy(F.desc("cnt"), F.asc(col))
