"""Capture .explain("formatted") for registry queries into plans/r12/.

Usage: python scripts/capture_plans.py <suffix> [query ...]
  suffix: "before" or "after" (file name suffix)
  query:  registry names; default = all queries.

Note: some query fns run driver-side jobs at build time (seed collects,
sketch probes, memo fills); that is part of their plan shape and is fine
here — we only record the final frame's physical plan.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sustainable_building_energy_benchmarking_pipeline_spark.plans.analytics import QUERIES
from sustainable_building_energy_benchmarking_pipeline_spark.session import get_spark, load_tables


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:] or sorted(QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    load_tables(spark, sf_dir)
    for name in names:
        try:
            df = QUERIES[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # record the failure, keep sweeping
            plan = f"ERROR capturing plan: {e!r}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
