"""Partitioning helpers shared by the text/vector hot paths.

The dedup/similarity kernels run vectorized Pandas UDF stages whose
parallelism equals the input partition count. Locally-generated corpora
often arrive as ONE small parquet file (= one task); at 100 TB the input
already has thousands of partitions and a blanket ``repartition()`` would
be a gratuitous full shuffle of the corpus. Gate the round-robin on the
actual partition count so the small-input path parallelizes and the
large-input path pays nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pin_shuffle_width(df: DataFrame, *cols: str, n: int | None = None) -> DataFrame:
    """Explicit hash repartition on ``cols`` at the session's configured
    shuffle width — for shuffles whose DOWNSTREAM cost is per-row or
    per-group CPU (block-GEMM groups, posting-list pair generation,
    kernel verifies) rather than bytes.

    The session default coalesces post-shuffle partitions by SIZE
    (advisoryPartitionSizeInBytes), which is right for byte-bound
    stages but wrong for these: a 10 MB posting shuffle whose reduce
    side emits Σc² pair rows coalesces to one task and serializes real
    compute — at ANY scale, because the bytes/CPU ratio, not the byte
    count, is what misleads the sizing. An explicit ``repartition(n,
    cols)`` shuffle is exempt from AQE coalescing (REPARTITION_BY_NUM
    origin) and satisfies the downstream groupBy / applyInPandas / join
    clustering requirement, so it pins the stage width WITHOUT adding
    an exchange. ``n`` defaults to ``spark.sql.shuffle.partitions`` —
    the same scale-configured width the pre-AQE plan would use (AQE
    only ever coalesces DOWN from it), so cluster deployments size it
    with the same knob they already own."""
    if n is None:
        n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, *[F.col(c) for c in cols])


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Round-robin ``repartition(n)`` ONLY when the input has fewer than
    ``n`` partitions (default: the cluster's defaultParallelism).

    The partition probe must stay PLAN-SIDE: ``df.rdd.getNumPartitions()``
    is exact, but under AQE it finalizes the physical plan — which
    EXECUTES every upstream shuffle stage, and the real pipeline then
    runs them again (the pitfall ``sketches.build_bloom`` documents and
    avoids). So: a plan containing an Exchange is returned unchanged —
    its output parallelism is already ~spark.sql.shuffle.partitions,
    which meets any defaultParallelism floor; exchange-free plans (scans
    and local relations — every hot-path caller here) have no stages
    ``.rdd`` could trigger, so the exact check is safe and keeps the
    small-single-file behavior this helper exists for.
    """
    n = n or df.sparkSession.sparkContext.defaultParallelism
    try:
        # executedPlan is the prepared (post-EnsureRequirements) physical
        # plan; under AQE its toString renders the INITIAL adaptive plan
        # without running any query stage (isFinalPlan=false). sparkPlan
        # would be cheaper still but predates exchange insertion, so it
        # never shows the very nodes this probe looks for.
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:  # internal-API drift: fail open, never break a query
        plan = "Exchange"
    if "Exchange" in plan:
        return df
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
