"""Focused per-query min-of-N timer mimicking bench.py's warmup protocol.
Usage: python scripts/minibench.py q50_dedup_clusters z10_winnowing_pairs ..."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sustainable_building_energy_benchmarking_pipeline_spark.session import get_spark, load_tables
from sustainable_building_energy_benchmarking_pipeline_spark.plans.analytics import QUERIES

def main():
    names = sys.argv[1:]
    reps = int(os.environ.get("MB_REPS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="minibench")
    spark.range(1).count()
    for df in load_tables(spark, sf_dir).values():
        df.limit(1).count()
    def _identity(it):
        yield from it
    spark.range(256).repartition(32).mapInPandas(_identity, "id long").count()
    for name in names:
        best = float("inf"); rows = None
        for _ in range(reps):
            t0 = time.perf_counter()
            rows = QUERIES[name].fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(f"{name}: {best:.3f}s rows={rows}", flush=True)
    spark.stop()

if __name__ == "__main__":
    main()
