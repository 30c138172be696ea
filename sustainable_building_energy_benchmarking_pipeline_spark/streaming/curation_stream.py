"""Streaming incremental corpus curation: the continuous-ingestion form
of ``plans.curation`` — each micro-batch of raw documents is
repetition-filtered, deduped within the batch, deduped against EVERY
document ever ingested, and appended to a Delta table exactly once.

Composition of the engine's scale pieces (this module adds no new
kernel, only the wiring a 100 TB ingestion loop needs):
- quality filter: pure array expressions (``plans.curation`` rules);
- in-batch dedup: min-id keep per text fingerprint (digest shuffle);
- cross-run dedup: ``bloom_incremental_dedup`` against the corpus —
  a driver-held Bloom LEDGER routes the overwhelmingly-new rows past
  the join entirely; only bloom-positive slivers anti-join the corpus
  table, so per-batch cost does not grow with corpus size;
- sink: ``write_delta_txn`` — the Delta txn action makes replayed
  micro-batches idempotent (Spark's foreachBatch replays on recovery).

Ledger lifecycle: the filter is (m, k)-fixed from the capacity plan so
per-batch filters OR-fold into it (``bloom_union``, set semantics —
replays fold harmlessly). A fresh process re-bootstraps the ledger from
the Delta table itself (one pass), so the table stays the single source
of truth; the in-memory ledger is only ever an over-approximation
re-checked by the exact anti-join. Per-source caps are deliberately NOT
part of the streaming path — a global top-k per source is not an
append-monotone property; run ``plans.curation`` (or z08) as a batch
compaction instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sustainable_building_energy_benchmarking_pipeline_spark.operators.sketches import (
    BloomFilter,
    bloom_params,
    bloom_union,
    build_bloom,
)
from sustainable_building_energy_benchmarking_pipeline_spark.sources import deltalog as dl

_FP_COL = "_fp"


class CurationIngestSink:
    """``foreachBatch`` callable maintaining the Bloom ledger + Delta
    corpus. One instance per streaming query; safe to restart (ledger
    re-bootstraps from the table)."""

    def __init__(
        self,
        path: str,
        app_id: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        dup_frac_max: float = 0.55,
        expected_items: int = 1_000_000,
        fp_rate: float = 0.01,
    ):
        self.path = path
        self.app_id = app_id
        self.text_col = text_col
        self.id_col = id_col
        self.dup_frac_max = dup_frac_max
        self._m, self._k = bloom_params(expected_items, fp_rate)
        self.bloom: BloomFilter | None = None  # bootstraps lazily

    # -- helpers ---------------------------------------------------------
    def _fingerprint(self, df: DataFrame) -> DataFrame:
        from sustainable_building_energy_benchmarking_pipeline_spark.plans.curation import (
            text_fingerprint,
        )

        return df.withColumn(_FP_COL, text_fingerprint(self.text_col))

    def _corpus(self, spark: SparkSession) -> DataFrame | None:
        try:
            return dl.read_delta(spark, self.path)
        except FileNotFoundError:
            return None

    def _corpus_fps(self, corpus: DataFrame) -> DataFrame:
        """One-column fingerprint frame for the history side. The sink
        PERSISTS ``_fp`` in the table (see ``__call__``), so this is a
        pruned column read — recomputing sha256 from raw text here would
        cost a full corpus re-hash EVERY micro-batch (and again at every
        bootstrap), a per-batch bill that grows with corpus size. Tables
        written before ``_fp`` was stored fall back to recomputing."""
        if _FP_COL in corpus.columns:
            return corpus.select(_FP_COL)
        return self._fingerprint(corpus).select(_FP_COL)

    def _ensure_bootstrap(self, spark: SparkSession) -> None:
        if self.bloom is not None:
            return
        corpus = self._corpus(spark)
        if corpus is None:
            self.bloom = BloomFilter(
                bits=bytes(self._m // 8), m=self._m, k=self._k
            )
        else:
            self.bloom = build_bloom(
                self._corpus_fps(corpus), _FP_COL, params=(self._m, self._k)
            )

    # -- the sink --------------------------------------------------------
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # quality filter + min-id dedup are the SAME helpers the batch
        # plan (plans.curation.curate_documents) composes — one
        # definition, so a threshold/normalization change cannot
        # silently diverge the streaming path from z09/the CLI
        from sustainable_building_energy_benchmarking_pipeline_spark.operators.sketches import (
            bloom_incremental_dedup,
        )
        from sustainable_building_energy_benchmarking_pipeline_spark.plans.curation import (
            dedup_min_id,
            repetition_frac,
        )

        spark = batch_df.sparkSession
        self._ensure_bootstrap(spark)

        clean = self._fingerprint(
            batch_df.filter(repetition_frac(self.text_col) <= self.dup_frac_max)
        )
        in_batch = dedup_min_id(clean, id_col=self.id_col)

        corpus = self._corpus(spark)
        cache_out: list[DataFrame] = []
        if corpus is None:
            new = in_batch
        else:
            new = bloom_incremental_dedup(
                self._corpus_fps(corpus),
                in_batch,
                _FP_COL,
                bloom=self.bloom,
                persist=True,
                cache_out=cache_out,
            )
        # write FIRST (txn makes replays no-ops), then fold the batch's
        # fingerprints into the ledger — folding after a skipped replay
        # is harmless (set semantics), and a fresh process re-bootstraps
        # from the table, so the ledger can never under-approximate the
        # DURABLE corpus across restarts. ``_fp`` is WRITTEN with the
        # row (~64 B/doc): every later micro-batch's anti-join history
        # side and every bootstrap become pruned column reads instead of
        # full-corpus sha256 recomputes — the storage-for-compute trade
        # a growing ingestion table must make. ``new`` already carries
        # ``_fp``; building the ledger delta from it directly avoids a
        # second per-row hash of the survivors.
        # back-compat: a table created before ``_fp`` was stored keeps
        # its schema (appending the extra column would be a mismatch);
        # it simply stays on the recompute path
        out = (
            new
            if corpus is None or _FP_COL in corpus.columns
            else new.drop(_FP_COL)
        )
        try:
            dl.write_delta_txn(
                out, self.path, self.app_id, batch_id, mode="append"
            )
            batch_bloom = build_bloom(
                new, _FP_COL, params=(self._m, self._k)
            )
            self.bloom = bloom_union(self.bloom, batch_bloom)
        finally:
            # release the per-batch cache — a long-running stream would
            # otherwise accrete one MEMORY_AND_DISK entry per micro-batch
            for frame in cache_out:
                frame.unpersist(blocking=False)


def curated_ingest_stream(
    stream_df: DataFrame,
    path: str,
    app_id: str,
    checkpoint_dir: str,
    **sink_kwargs,
):
    """Attach the curation sink to a streaming DataFrame of raw
    documents; returns the started StreamingQuery. The Delta table at
    ``path`` accumulates the curated corpus exactly once per document."""
    sink = CurationIngestSink(path, app_id, **sink_kwargs)
    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
