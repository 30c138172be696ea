"""Min-of-N per-query wall timer, bench-identical methodology (fn +
.count(), warmup as in bench.py, per-query memo pinning as in bench.py).

Usage: python scripts/ab_time.py [-n N] query [query ...]
Prints one line per query: name min median all-samples.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sustainable_building_energy_benchmarking_pipeline_spark.plans.analytics import QUERIES
from sustainable_building_energy_benchmarking_pipeline_spark.session import (
    get_spark,
    load_tables,
    clear_query_cache,
)
from sustainable_building_energy_benchmarking_pipeline_spark.operators.dedup import (
    _CLUSTER_LABEL_CACHE,
    _GRAM_FRAME_CACHE,
)


def main():
    args = sys.argv[1:]
    n = 5
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-time")
    spark.range(1).count()
    for df in load_tables(spark, sf_dir).values():
        df.limit(1).count()

    def _identity(it):
        yield from it

    spark.range(256).repartition(32).mapInPandas(_identity, "id long").count()
    # bench-equivalent codegen warmup (abridged)
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F

    base = spark.range(100_000).select(
        _F.col("id"), (_F.col("id") % 97).alias("k"), _F.rand(7).alias("x"),
        _F.concat(_F.lit("s"), (_F.col("id") % 1000).cast("string")).alias("s"),
    )
    small = spark.range(97).select(_F.col("id").alias("k"), _F.lit("d").alias("d"))
    (base.join(_F.broadcast(small), "k").groupBy("k")
     .agg(_F.sum("x").alias("sx"), _F.count(_F.lit(1)).alias("n"))
     .orderBy(_F.desc("sx")).limit(5).count())
    base.join(base.select("id", _F.col("x").alias("y")), "id").groupBy("k").count().count()
    (base.select("id", "k",
                 _F.avg("x").over(_W.partitionBy("k").orderBy("id").rowsBetween(-2, 0)).alias("m"),
                 _F.lag("x", 1).over(_W.partitionBy("k").orderBy("id")).alias("l"))
     .where(_F.col("m") > 0).count())
    (base.select("k", _F.explode(_F.split(_F.repeat(_F.col("s"), 3), "s")).alias("t"))
     .groupBy("k", "t").count().count())

    cache_pre, gram_pre = {}, {}

    def run_one(name):
        pre = cache_pre.setdefault(name, set(_CLUSTER_LABEL_CACHE))
        for k in [k for k in _CLUSTER_LABEL_CACHE if k not in pre]:
            _CLUSTER_LABEL_CACHE.pop(k, None)
        gpre = gram_pre.setdefault(name, set(_GRAM_FRAME_CACHE))
        for k in [k for k in _GRAM_FRAME_CACHE if k not in gpre]:
            entry = _GRAM_FRAME_CACHE.pop(k, None)
            if entry is not None:
                entry[1].unpersist(blocking=False)
        t0 = time.perf_counter()
        df = QUERIES[name].fn(spark, sf_dir)
        df.count()
        el = time.perf_counter() - t0
        clear_query_cache(spark)
        return el

    for name in names:
        spark.sparkContext.setJobDescription(name)
        ts = sorted(run_one(name) for _ in range(n))
        print(
            f"{name:32s} min={ts[0]:7.3f} med={ts[len(ts)//2]:7.3f} "
            f"all=[{', '.join(f'{t:.3f}' for t in ts)}]",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
