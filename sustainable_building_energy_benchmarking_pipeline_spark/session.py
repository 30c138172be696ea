"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[N]`` single-JVM; the configs below are chosen so
the same code runs unchanged on a multi-executor cluster at 100 TB:

- AQE on (runtime coalescing, skew-join splitting, dynamic join strategy);
- Arrow on (vectorized pandas interchange for the few Pandas-UDF operators);
- session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle and are cluster-invariant;
- shuffle partitions sized from the env (local) — on a real cluster AQE
  coalesces from a high initial number, so we set the initial high and let
  AQE shrink rather than hand-tuning per job.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sustainable-building-energy-benchmarking-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Parameters are overridable for tests; env vars ``SPARK_GRAFT_CPUS``
    controls local parallelism (default 32 per the driver harness).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- correctness-critical ---
        .config("spark.sql.session.timeZone", "UTC")
        # --- scale-critical: Adaptive Query Execution ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing: high initial, AQE coalesces down ---
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # --- Arrow for the pandas-UDF operators (dedup/ML/multimodal) ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- broadcast dims aggressively (region/nation/supplier-sized) ---
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- parquet: vectorized reader + pushdown are defaults; pin anyway ---
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # quieter local runs
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Load one driver-testdata parquet table with schema quirks handled."""
    from pyspark.sql import functions as F

    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS) which the Spark parquet
        # reader rejects; read nanos as long and convert to microsecond
        # TimestampType (integer DIV keeps full precision — a double cast
        # would truncate ns-since-epoch beyond 2^53).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Load the driver testdata parquet tables as a dict of DataFrames and
    register each as a temp view (so ``spark.sql`` works symmetrically with
    the DuckDB oracle)."""
    all_names = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    out = {}
    for name in names or all_names:
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            df = load_table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
