"""as-of join semantics (operators/asof.py) on hand-computed fixtures,
plus the plan-shape guarantee (one shuffle, no nested-loop join)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sustainable_building_energy_benchmarking_pipeline_spark.operators.asof import asof_join


def _ts(m: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(10)),
            (2, "u1", _ts(20)),
            (3, "u1", _ts(5)),   # before every right row
            (4, "u2", _ts(10)),  # key with no right rows at all
        ],
        "lid INT, k STRING, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            (100, "u1", _ts(8), 1.0),
            (101, "u1", _ts(10), 2.0),  # equal-ts: inclusive for lid=1
            (102, "u1", _ts(15), 3.0),
        ],
        "rid INT, k STRING, ts TIMESTAMP, v DOUBLE",
    )
    return left, right


def test_backward_inclusive_and_unmatched(frames):
    left, right = frames
    got = {
        r["lid"]: (r["rid_right"], r["v_right"])
        for r in asof_join(left, right, on="ts", by=["k"]).collect()
    }
    assert got == {
        1: (101, 2.0),   # equal ts matches (inclusive), beats the 08:00 row
        2: (102, 3.0),   # latest at/before 20
        3: (None, None), # nothing at/before 5
        4: (None, None), # key never appears on the right
    }


def test_forward(frames):
    left, right = frames
    got = {
        r["lid"]: r["rid_right"]
        for r in asof_join(left, right, on="ts", by=["k"], direction="forward").collect()
    }
    assert got == {1: 101, 2: None, 3: 100, 4: None}


def test_tolerance_voids_far_matches(frames):
    left, right = frames
    got = {
        r["lid"]: r["rid_right"]
        for r in asof_join(
            left, right, on="ts", by=["k"], tolerance=F.expr("INTERVAL 2 MINUTES")
        ).collect()
    }
    # lid=2 matched rid=102 at a 5-minute gap -> voided; lid=1 gap 0 -> kept
    assert got == {1: 101, 2: None, 3: None, 4: None}


def test_right_ts_tie_breaks_by_payload(spark):
    left = spark.createDataFrame([(1, "u", _ts(10))], "lid INT, k STRING, ts TIMESTAMP")
    right = spark.createDataFrame(
        [(7, "u", _ts(9)), (9, "u", _ts(9)), (8, "u", _ts(9))],
        "rid INT, k STRING, ts TIMESTAMP",
    )
    [row] = asof_join(left, right, on="ts", by=["k"]).collect()
    assert row["rid_right"] == 9  # max payload struct wins (unique id first)


def test_right_ts_tie_breaks_by_payload_forward_and_nearest(spark):
    """The documented max-struct tiebreak holds in EVERY direction — the
    forward fill must order the duplicate run descending or first()
    silently picks the MIN struct."""
    left = spark.createDataFrame([(1, "u", _ts(10))], "lid INT, k STRING, ts TIMESTAMP")
    right = spark.createDataFrame(
        [(7, "u", _ts(12)), (9, "u", _ts(12)), (8, "u", _ts(12))],
        "rid INT, k STRING, ts TIMESTAMP",
    )
    [fwd] = asof_join(left, right, on="ts", by=["k"], direction="forward").collect()
    assert fwd["rid_right"] == 9
    # nearest: the only candidates are the forward duplicates at ts=12
    [near] = asof_join(left, right, on="ts", by=["k"], direction="nearest").collect()
    assert near["rid_right"] == 9


def test_plan_one_shuffle_no_nested_loop(frames):
    left, right = frames
    plan = asof_join(left, right, on="ts", by=["k"])._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    # exactly one hash-partitioning exchange (on the by-key) feeds the window
    n_hash_exchanges = plan.count("hashpartitioning")
    assert n_hash_exchanges == 1, plan


def test_nearest_matches_pandas_merge_asof(spark):
    """direction='nearest' == pandas merge_asof(direction='nearest') on
    randomized per-key series, with and without tolerance (backward wins
    exact ties in both)."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, f"k{rng.randint(3)}", base + dt.timedelta(minutes=int(rng.randint(0, 500))))
        for i in range(80)
    ]
    # unique (k, ts) per right row by construction — Spark and pandas
    # would otherwise pick equal-ts duplicates differently
    slots = [(k, m) for k in range(3) for m in range(0, 500, 7)]
    rng.shuffle(slots)
    rrows = [
        (100 + i, f"k{k}", base + dt.timedelta(minutes=m), float(i))
        for i, (k, m) in enumerate(slots[:60])
    ]
    left = spark.createDataFrame(lrows, "lid INT, k STRING, ts TIMESTAMP")
    right = spark.createDataFrame(rrows, "rid INT, k STRING, ts TIMESTAMP, v DOUBLE")

    lpd = pd.DataFrame(lrows, columns=["lid", "k", "ts"]).sort_values("ts")
    rpd = pd.DataFrame(rrows, columns=["rid", "k", "ts", "v"]).sort_values("ts")

    for tol_spark, tol_pd in [
        (None, None),
        (F.expr("INTERVAL 30 MINUTES"), pd.Timedelta(minutes=30)),
    ]:
        got = {
            r.lid: r.v_right
            for r in asof_join(
                left, right,
                on="ts", by=["k"],
                right_cols={"rid": "rid_right", "v": "v_right"},
                direction="nearest", tolerance=tol_spark,
            ).collect()
        }
        want_df = pd.merge_asof(
            lpd, rpd, on="ts", by="k", direction="nearest", tolerance=tol_pd
        )
        want = {
            int(row.lid): (None if pd.isna(row.v) else float(row.v))
            for row in want_df.itertuples()
        }
        assert got == want, {k: (got[k], want[k]) for k in want if got[k] != want[k]}
