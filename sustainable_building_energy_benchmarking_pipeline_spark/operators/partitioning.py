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


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Round-robin ``repartition(n)`` ONLY when the input has fewer than
    ``n`` partitions (default: the cluster's defaultParallelism).

    ``df.rdd.getNumPartitions()`` plans the query but launches no job —
    a constant-time driver check, not a scan.
    """
    n = n or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
