"""Streaming incremental curation (streaming/curation_stream.py):
batch-parity with the one-shot curation rules, replay idempotence,
restart re-bootstrap, and the real readStream wiring.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sustainable_building_energy_benchmarking_pipeline_spark.sources import deltalog as dl
from sustainable_building_energy_benchmarking_pipeline_spark.streaming.curation_stream import (
    CurationIngestSink,
    curated_ingest_stream,
)

# three micro-batches; doc_ids increase across batches so the earliest
# instance of a duplicate IS the min-id instance (exact batch parity)
_BATCHES = [
    [
        (1, "alpha beta gamma delta epsilon", "src0"),
        (2, "spam spam spam spam spam spam", "src0"),       # repetitive → drop
        (3, "one two three four five six", "src1"),
        (4, "alpha beta gamma delta epsilon", "src1"),      # in-batch dup of 1
    ],
    [
        (5, "alpha beta gamma delta epsilon", "src0"),      # cross-batch dup of 1
        (6, "seven eight nine ten eleven", "src1"),
    ],
    [
        (7, "one two three four five six", "src0"),         # cross-batch dup of 3
        (8, "twelve thirteen fourteen fifteen sixteen", "src0"),
        (9, "ham ham ham ham ham ham ham", "src1"),          # repetitive → drop
    ],
]
_SCHEMA = "doc_id LONG, text STRING, source STRING"


def _expected_ids(spark):
    """One-shot reference: repetition filter + min-id dedup over ALL rows."""
    allrows = [r for b in _BATCHES for r in b]
    df = spark.createDataFrame(allrows, _SCHEMA)
    from sustainable_building_energy_benchmarking_pipeline_spark.functions.text import ws_tokens

    toks = ws_tokens(F.col("text"))
    dup_frac = F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / F.size(
        toks
    ).cast("double")
    clean = df.filter(dup_frac <= 0.55).withColumn(
        "_fp", F.sha2(F.lower(F.trim("text")), 256)
    )
    kept = (
        clean.withColumn("_keep", F.min("doc_id").over(Window.partitionBy("_fp")))
        .filter(F.col("doc_id") == F.col("_keep"))
    )
    return sorted(r["doc_id"] for r in kept.collect())


def test_curation_sink_batch_parity_and_replay(spark, tmp_path):
    path = str(tmp_path / "corpus")
    sink = CurationIngestSink(path, "cur-app", expected_items=10_000)
    for i, rows in enumerate(_BATCHES):
        sink(spark.createDataFrame(rows, _SCHEMA), i)

    got = sorted(r["doc_id"] for r in dl.read_delta(spark, path).collect())
    assert got == _expected_ids(spark) == [1, 3, 6, 8]

    # replayed micro-batch (Spark recovery): txn watermark skips the
    # write; corpus unchanged
    sink(spark.createDataFrame(_BATCHES[1], _SCHEMA), 1)
    assert sorted(r["doc_id"] for r in dl.read_delta(spark, path).collect()) == got

    # process restart: a FRESH sink re-bootstraps its ledger from the
    # table and keeps deduping against everything already ingested
    sink2 = CurationIngestSink(path, "cur-app", expected_items=10_000)
    sink2(
        spark.createDataFrame(
            [(10, "alpha beta gamma delta epsilon", "src9"),   # dup of 1
             (11, "brand new unique document here", "src9")],
            _SCHEMA,
        ),
        3,
    )
    assert sorted(
        r["doc_id"] for r in dl.read_delta(spark, path).collect()
    ) == [1, 3, 6, 8, 11]


def test_curated_ingest_stream_end_to_end(spark, tmp_path):
    """Real readStream file source, one file per micro-batch."""
    input_dir = str(tmp_path / "in")
    for i, rows in enumerate(_BATCHES):
        (
            spark.createDataFrame(rows, _SCHEMA)
            .coalesce(1)
            .write.mode("append" if i else "overwrite")
            .parquet(input_dir)
        )
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    path = str(tmp_path / "corpus")
    q = curated_ingest_stream(
        stream,
        path,
        "cur-stream",
        str(tmp_path / "ckpt"),
        expected_items=10_000,
    )
    # availableNow isn't set by the helper; bound the run manually
    q.processAllAvailable()
    q.stop()
    got = set(r["doc_id"] for r in dl.read_delta(spark, path).collect())
    # file order isn't guaranteed across micro-batches, so assert the
    # CONTENT-level invariant: one survivor per unique clean text
    fps = (
        dl.read_delta(spark, path)
        .select(F.sha2(F.lower(F.trim("text")), 256).alias("fp"))
        .collect()
    )
    assert len(fps) == len(set(r["fp"] for r in fps)) == 4
    assert got <= {1, 3, 4, 5, 6, 7, 8}  # never a repetitive doc


def test_curation_sink_releases_per_batch_cache(spark, tmp_path):
    """The sink persists the bloom-flagged frame per micro-batch (the
    single-scan posture); a long-running stream must not accrete one
    cache entry per batch — every batch ends with the storage cache no
    larger than it started."""
    path = str(tmp_path / "corpus")
    sink = CurationIngestSink(path, "cache-app", expected_items=10_000)

    def n_cached():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    before = n_cached()
    for i, rows in enumerate(_BATCHES):
        sink(spark.createDataFrame(rows, _SCHEMA), i)
        assert n_cached() <= before, f"batch {i} leaked a cache entry"
