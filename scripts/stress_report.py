"""Per-round stress artifact: run the opt-in 10× suite and the
superlinearity-tripwire measurements, write STRESS_r{N}.json.

The SCALE.md 100× claims rest on analysis plus the sf0.01→sf0.1 ratio
tripwire; this script turns each round's 10× rehearsal into a committed
receipt so code changes cannot silently regress the heavy families.

Usage: python scripts/stress_report.py <round_number>
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_stress_suite() -> dict:
    """The SPARK_GRAFT_STRESS=1 pytest suite, per-test durations parsed
    from --durations output."""
    env = dict(os.environ, SPARK_GRAFT_STRESS="1")
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_stress_10x.py", "-q",
         "--durations=0"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    per_test = {
        m.group(2): float(m.group(1))
        for m in re.finditer(r"(\d+\.\d+)s call\s+\S+::(\w+)", p.stdout)
    }
    return {
        "rc": p.returncode,
        "wall_sec": round(time.time() - t0, 2),
        "per_test_sec": per_test,
        "summary": p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "",
    }


def run_scaling_ratios() -> dict:
    """The tests/test_scaling.py measurement, in-process: min-of-3 per
    query at sf0.01 and sf0.1, ratio must stay under the tripwire."""
    sys.path.insert(0, REPO)
    from sustainable_building_energy_benchmarking_pipeline_spark.plans.analytics import QUERIES
    from sustainable_building_energy_benchmarking_pipeline_spark.session import get_spark
    from tests.test_scaling import HEAVY, MAX_RATIO, SF_BIG, SF_SMALL, _min_time

    spark = get_spark(app_name="stress-report")
    out = {}
    for name in HEAVY:
        fn = QUERIES[name].fn
        fn(spark, SF_SMALL).count()  # warm-up
        t_small = _min_time(lambda: fn(spark, SF_SMALL).count())
        t_big = _min_time(lambda: fn(spark, SF_BIG).count())
        ratio = t_big / max(t_small, 0.05)
        out[name] = {
            "sf0.01_sec": round(t_small, 4),
            "sf0.1_sec": round(t_big, 4),
            "ratio": round(ratio, 2),
            "within_tripwire": ratio < MAX_RATIO,
        }
    spark.stop()
    return {"max_ratio_allowed": MAX_RATIO, "queries": out}


def main() -> int:
    round_no = int(sys.argv[1])
    artifact = {
        "round": round_no,
        "stress_10x": run_stress_suite(),
        "scaling_tripwire": run_scaling_ratios(),
    }
    dest = os.path.join(REPO, f"STRESS_r{round_no}.json")
    with open(dest, "w") as f:
        json.dump(artifact, f, indent=1)
    ok = artifact["stress_10x"]["rc"] == 0 and all(
        q["within_tripwire"]
        for q in artifact["scaling_tripwire"]["queries"].values()
    )
    print(f"wrote {dest}; all green: {ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
