"""Cluster-scale machinery proofs: dynamic partition pruning on a
partitioned fact table, and the streaming → versioned-table foreachBatch
sink pattern (each micro-batch an atomic commit, exactly-once per batch)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sustainable_building_energy_benchmarking_pipeline_spark.session import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_dynamic_partition_pruning(spark, tmp_path_factory):
    """A dim-filtered join against a partition-keyed fact must plan a
    dynamicpruning subquery on the fact scan — at scale this is the
    difference between scanning one year and scanning the table."""
    base = tmp_path_factory.mktemp("dpp")
    fact_dir = str(base / "orders_by_year")
    orders = load_table(spark, SF_DIR, "orders")
    (
        orders.withColumn("o_year", F.year("o_orderdate"))
        .write.partitionBy("o_year")
        .parquet(fact_dir)
    )
    fact = spark.read.parquet(fact_dir)
    years = spark.createDataFrame(
        [(1995, "target"), (1996, "target"), (2001, "other")], "yr INT, tag STRING"
    )
    joined = fact.join(
        years.where(F.col("tag") == "target"), fact["o_year"] == years["yr"]
    )
    optimized = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "dynamicpruning" in optimized.lower(), optimized
    # and the result equals the statically filtered equivalent
    want = orders.where(F.year("o_orderdate").isin(1995, 1996)).count()
    assert joined.count() == want


def test_foreachbatch_versioned_sink(spark, tmp_path_factory):
    """Streaming events upserted into a versioned table via foreachBatch:
    each micro-batch commits atomically (one version per batch), and the
    final latest-state read equals the batch compaction of all input."""
    from sustainable_building_energy_benchmarking_pipeline_spark.sources.versioned import (
        read_versioned,
        table_history,
        write_versioned,
    )
    from sustainable_building_energy_benchmarking_pipeline_spark.streaming.events_stream import (
        event_stream,
    )

    base = tmp_path_factory.mktemp("stream_versioned")
    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    input_dir = str(base / "input")
    mid = events.agg(F.expr("percentile(CAST(ts AS DOUBLE), 0.5)")).first()[0]
    events.filter(F.col("ts").cast("double") <= mid).coalesce(1).write.parquet(input_dir)
    events.filter(F.col("ts").cast("double") > mid).coalesce(1).write.mode(
        "append"
    ).parquet(input_dir)

    table_dir = str(base / "versioned")

    def upsert_batch(batch_df, batch_id: int) -> None:
        # latest value per user within the batch, appended as one commit
        latest = batch_df.groupBy("user_id").agg(
            F.max_by(F.struct("ts", "value"), "ts").alias("_s")
        ).select("user_id", F.col("_s.ts").alias("ts"), F.col("_s.value").alias("value"))
        write_versioned(latest, table_dir, mode="append", metadata={"batch": batch_id})

    q = (
        event_stream(spark, input_dir, max_files_per_trigger=1)
        .writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", str(base / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    history = table_history(table_dir)
    assert len(history) >= 2, "expected one commit per micro-batch"

    # compact the appended changelog to latest-per-user and compare with
    # the batch answer over the full input
    got = (
        read_versioned(spark, table_dir)
        .groupBy("user_id")
        .agg(F.max_by(F.struct("ts", "value"), "ts").alias("_s"))
        .select("user_id", F.col("_s.value").alias("value"))
    )
    want = (
        events.groupBy("user_id")
        .agg(F.max_by(F.struct("ts", "value"), "ts").alias("_s"))
        .select("user_id", F.col("_s.value").alias("value"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
