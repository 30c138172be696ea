"""Reader/writer layer (SURVEY §2.1).

Every source/sink the reference uses, Spark-first: explicit schemas
(never inference on the hot path), format dispatch, the reference's
fallback-directory discovery and alias-coalescing behaviors as reusable
helpers, ingestion metadata, metadata sidecars, and content-hash write
skipping.

| Here | SURVEY | Reference behavior |
|---|---|---|
| read_table / write_table    | S1,S2,S7-S9,S11 | csv/parquet/json scans+sinks |
| fallback_scan               | S6  | first readable glob under processed→sample dirs (src/export_json.py:73-88) |
| coalesce_aliases            | P16 | first present non-null of aliased columns w/ default (src/export_json.py:91-121) |
| with_ingestion_metadata     | S13 | _ingested_at, _source_file (notebooks/benchmarking_medallion.py:92-95) |
| write_with_sidecar          | S14 | parquet footer key-value metadata → sidecar JSON (scripts/export_gold_parquet.py:95-110) |
| content_hash / write_if_changed | S15 | SHA-256 diff-skip publish (scripts/push_to_huggingface.py:30-86) |
| read_jdbc / write_jdbc      | S4,S12 | parameterized SELECT scan; 1000-row batched append (src/db.py:65-110,166) |
"""

from __future__ import annotations

import json
import os
from glob import glob
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# format-dispatched read/write (S1, S2, S7-S9, S11)
# ---------------------------------------------------------------------------

def read_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    fmt: str | None = None,
    **options: str,
) -> DataFrame:
    """Explicit-schema scan. Format inferred from extension when omitted.
    Schema inference is deliberately NOT the default — an inference pass
    is an extra full scan at 100 TB; pass a schema or accept parquet's
    embedded one."""
    fmt = fmt or _infer_fmt(path)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        options.setdefault("inferSchema", "true")  # explicit opt-in only
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).format(fmt).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Format-dispatched sink. ``partition_by`` is the scale lever — the
    reference's PostgreSQL secondary indexes (src/db.py:34-40) become
    partition pruning on (e.g.) zone_id/date directories."""
    fmt = fmt or _infer_fmt(path)
    writer = df.write.mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).format(fmt).save(path)


def _infer_fmt(path: str) -> str:
    for ext in ("parquet", "csv", "json", "orc"):
        if path.rstrip("/").endswith(ext):
            return ext
    return "parquet"


# ---------------------------------------------------------------------------
# S6: fallback-directory glob discovery
# ---------------------------------------------------------------------------

def fallback_scan(
    spark: SparkSession,
    search_dirs: list[str],
    patterns: tuple[str, ...] = ("*.parquet", "*.csv"),
    schema: T.StructType | None = None,
    **options: str,
) -> DataFrame:
    """First readable match wins: try each directory in priority order,
    each pattern within it (the reference's processed→sample fallback,
    src/export_json.py:73-88). Spark globs natively once a match level is
    chosen — the directory *priority* is the part Spark doesn't do."""
    for d in search_dirs:
        for pat in patterns:
            matches = sorted(glob(os.path.join(d, pat)))
            if matches:
                fmt = _infer_fmt(matches[0])
                return read_table(
                    spark, os.path.join(d, pat), schema=schema, fmt=fmt, **options
                )
    raise FileNotFoundError(
        f"no {patterns} under any of {search_dirs}"
    )


# ---------------------------------------------------------------------------
# P16: column-alias coalescing
# ---------------------------------------------------------------------------

def coalesce_aliases(
    df: DataFrame,
    aliases: dict[str, list[str]],
    defaults: dict[str, Any] | None = None,
    keep_others: bool = False,
) -> DataFrame:
    """Resolve each logical column from the first *present* alias,
    null-coalesced against the remaining present aliases then the default
    (src/export_json.py:91-121 ``get_col``). Schema tolerance as a
    library helper, not engine semantics: existence is checked against
    ``df.columns`` driver-side; the per-row null fallback is one
    ``F.coalesce`` — no UDF, no extra pass."""
    defaults = defaults or {}
    out_cols: list[Column] = []
    for logical, names in aliases.items():
        present = [n for n in names if n in df.columns]
        arms: list[Column] = [F.col(n) for n in present]
        if logical in defaults:
            arms.append(F.lit(defaults[logical]))
        if not arms:
            arms = [F.lit(None)]
        out_cols.append(F.coalesce(*arms).alias(logical))
    if keep_others:
        claimed = {n for names in aliases.values() for n in names}
        out_cols = [F.col(c) for c in df.columns if c not in claimed] + out_cols
    return df.select(*out_cols)


# ---------------------------------------------------------------------------
# S13: ingestion metadata
# ---------------------------------------------------------------------------

def with_ingestion_metadata(df: DataFrame) -> DataFrame:
    """Bronze-layer lineage columns (notebooks/benchmarking_medallion.py:92-95)."""
    return df.withColumns(
        {
            "_ingested_at": F.current_timestamp(),
            "_source_file": F.input_file_name(),
        }
    )


# ---------------------------------------------------------------------------
# S14: metadata sidecar  /  S15: content-hash diff skip
# ---------------------------------------------------------------------------

def write_with_sidecar(
    df: DataFrame,
    path: str,
    metadata: dict[str, Any],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write the table plus a ``_metadata.json`` sidecar carrying the
    pipeline/layer/generated-at key-values the reference embeds in
    parquet footers (scripts/export_gold_parquet.py:95-110). A sidecar —
    not footer metadata — so it survives format changes and is readable
    without a parquet reader; Delta would use TBLPROPERTIES."""
    write_table(df, path, fmt=fmt, mode=mode)
    with open(os.path.join(path, "_metadata.json"), "w") as f:
        json.dump(metadata, f, indent=2, sort_keys=True, default=str)


def content_hash(df: DataFrame) -> str:
    """Order-insensitive SHA-256 of the full content: per-row sha2 over
    the canonical JSON of a sorted-field struct, SUM-aggregated (into
    decimal, overflow-free) so the hash is partition- and order-
    independent but multiplicity-sensitive. SUM, not bit_xor: under XOR
    any dataset in which every row appears an even number of times
    cancels to 0 ({a,a,b,b} and {c,c,d,d} collide — a silent skipped
    write); an order-insensitive sum keeps each duplicate's
    contribution. Two independent hash lanes + the row count make
    engineered collisions impractical. Distributed — no collect of
    data, one aggregate row."""
    import hashlib

    cols = sorted(df.columns)
    row_json = F.to_json(F.struct(*[F.col(c) for c in cols]))
    agg = df.agg(
        F.sum(F.xxhash64(row_json).cast("decimal(38,0)")).alias("l0"),
        F.sum(F.xxhash64(row_json, F.lit("lane-2")).cast("decimal(38,0)")).alias("l1"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    payload = json.dumps([agg["n"], str(agg["l0"]), str(agg["l1"])])
    return hashlib.sha256(payload.encode()).hexdigest()


def write_if_changed(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    metadata: dict[str, Any] | None = None,
) -> bool:
    """Skip the write when content is unchanged (S15: the reference's
    SHA-256 publish gate, scripts/push_to_huggingface.py:76-86). Returns
    True when a write happened. The previous hash rides in the sidecar."""
    new_hash = content_hash(df)
    sidecar = os.path.join(path, "_metadata.json")
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            if json.load(f).get("content_sha256") == new_hash:
                return False
    meta = dict(metadata or {})
    meta["content_sha256"] = new_hash
    write_with_sidecar(df, path, meta, fmt=fmt)
    return True


# ---------------------------------------------------------------------------
# S4 / S12: JDBC scan and batched sink
# ---------------------------------------------------------------------------

def read_jdbc(
    spark: SparkSession,
    url: str,
    query: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Parameterized-SELECT scan (src/db.py:166). Pass the partition_*
    quartet for a parallel range-partitioned read — a single-connection
    JDBC scan is the 100 TB anti-pattern.

    Spark forbids combining the ``query`` option with ``partitionColumn``
    (found the hard way against embedded Derby — see
    tests/test_io.py::test_jdbc_roundtrip_derby), so the partitioned
    form wraps the SELECT as a ``dbtable`` subquery; Spark then appends
    its per-partition range predicates to that derived table. Quote
    identifiers in ``query``/``partition_column`` to match how Spark
    writes them (it creates tables with quoted, case-preserved names,
    which case-folding databases like Derby otherwise won't resolve)."""
    reader = spark.read.format("jdbc").option("url", url)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("dbtable", f"({query}) spark_subq")
            .option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    else:
        reader = reader.option("query", query)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 1000,
    properties: dict[str, str] | None = None,
) -> None:
    """Batched append (src/db.py:65-110): the reference's hand-rolled
    1,000-row executemany loop is the JDBC writer's ``batchsize`` option;
    each write task batches independently."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


# ---------------------------------------------------------------------------
# Small-files compaction (the maintenance pass a 100 TB lake needs)
# ---------------------------------------------------------------------------

def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Rewrite a table directory into ~``target_file_bytes`` files —
    the OPTIMIZE/compaction pass that keeps scan task counts sane after
    many small incremental writes (a thousand 1 MB files cost a
    thousand tasks + footer reads; one 128 MB file costs one).

    File count comes from the table's actual on-disk size (filesystem
    stat, no data scan), then one shuffle-free coalesce rewrite when
    shrinking, or repartition when growing parallelism. Writes to a
    temp sibling then atomically swaps directories, so readers never
    see a partial table. Returns the new file count."""
    import shutil

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, -(-total // target_file_bytes))  # ceil
    df = read_table(spark, path, fmt=fmt)
    current = df.rdd.getNumPartitions()
    out = df.coalesce(n_files) if n_files < current else df.repartition(n_files)
    tmp = path.rstrip("/") + "._compact_tmp"
    out.write.mode("overwrite").format(fmt).save(tmp)
    old = path.rstrip("/") + "._compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files
