"""Domain-parity tests for the HVAC pipeline, mirroring the reference's
test pyramid (SURVEY §5): shape goldens, schema presence, value domains,
physical invariants, recomputation checks, scenario-injection detector
tests, partition independence, and end-to-end."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sustainable_building_energy_benchmarking_pipeline_spark.plans import detection, hvac
from sustainable_building_energy_benchmarking_pipeline_spark.schemas import HVAC_FEATURE_COLS
from sustainable_building_energy_benchmarking_pipeline_spark.sources import generators


@pytest.fixture(scope="module")
def hvac_small(spark):
    """1 day × 2 zones, no faults (reference test fixture shape)."""
    return generators.generate_hvac_data(
        spark, days=1, n_zones=2, with_faults=False
    ).cache()


@pytest.fixture(scope="module")
def hvac_faulty(spark):
    """5 days × 3 zones with fault episodes."""
    return generators.generate_hvac_data(spark, days=5, n_zones=3).cache()


@pytest.fixture(scope="module")
def features(hvac_faulty):
    return hvac.run_feature_pipeline(hvac_faulty).cache()


def test_base_profile_shape_golden(hvac_small):
    # 1 day × 288 ticks × 2 zones = 576 (tests/test_generate_hvac_data.py:24-25)
    assert hvac_small.count() == 576


def test_base_profile_schema(hvac_small):
    required = [
        "timestamp", "zone_id", "ahu_id", "temp_zone_c", "rh_zone_pct",
        "supply_air_temp_c", "return_air_temp_c", "power_kw",
        "fan_speed_pct", "setpoint_c", "mode", "fault_type",
    ]
    assert set(required) <= set(hvac_small.columns)


def test_value_domains(hvac_faulty):
    # tests/test_generate_hvac_data.py:42-46,74-77
    row = hvac_faulty.agg(
        F.min("temp_zone_c").alias("tmin"), F.max("temp_zone_c").alias("tmax"),
        F.min("rh_zone_pct").alias("rmin"), F.max("rh_zone_pct").alias("rmax"),
        F.min("fan_speed_pct").alias("fmin"), F.max("fan_speed_pct").alias("fmax"),
        F.min("power_kw").alias("pmin"),
    ).collect()[0]
    assert 15 <= row.tmin and row.tmax <= 35
    assert 30 <= row.rmin and row.rmax <= 60
    assert 0 <= row.fmin and row.fmax <= 100
    assert row.pmin >= 0


def test_physical_invariants(hvac_small):
    # return warmer than supply on average; |temp−setpoint| < 2 normally
    # (tests/test_generate_hvac_data.py:111-127)
    row = hvac_small.agg(
        F.avg(F.col("return_air_temp_c") - F.col("supply_air_temp_c")).alias("d"),
        F.avg(F.abs(F.col("temp_zone_c") - F.col("setpoint_c"))).alias("e"),
    ).collect()[0]
    assert row.d > 0
    assert row.e < 2


def test_mode_schedule(hvac_small):
    bad = hvac_small.filter(
        (
            (F.hour("timestamp") + F.minute("timestamp") / 60).between(8, 18)
            & (F.col("mode") != "cooling")
        )
        | (
            ~(F.hour("timestamp") + F.minute("timestamp") / 60).between(8, 18)
            & (F.col("mode") != "off")
        )
    ).count()
    assert bad == 0


def test_determinism_partition_invariant(spark):
    """Hash-based RNG: same data regardless of parallelism."""
    a = generators.generate_hvac_base(spark, days=1, n_zones=2).orderBy("zone_id", "timestamp")
    b = (
        generators.generate_hvac_base(spark, days=1, n_zones=2)
        .repartition(13)
        .orderBy("zone_id", "timestamp")
    )
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_features_28_columns(features):
    assert set(HVAC_FEATURE_COLS) <= set(features.columns)
    assert len(features.columns) == 28


def test_features_recomputation(features):
    # temp_error_c == temp − setpoint; delta == return − supply
    # (tests/test_pipeline_batch.py:75-81)
    bad = features.filter(
        (F.abs(F.col("temp_error_c") - (F.col("temp_zone_c") - F.col("setpoint_c"))) > 1e-6)
        | (
            F.abs(
                F.col("delta_return_supply")
                - (F.col("return_air_temp_c") - F.col("supply_air_temp_c"))
            )
            > 1e-6
        )
    ).count()
    assert bad == 0


def test_features_no_nulls(features):
    cols = HVAC_FEATURE_COLS
    bad = features.filter(
        F.greatest(*[F.col(c).isNull().cast("int") for c in cols]) == 1
    ).count()
    assert bad == 0


def test_partition_independence(spark, hvac_faulty):
    """Window features per zone equal features computed on that zone alone
    (tests/test_pipeline_batch.py:153-168)."""
    one_zone = hvac_faulty.filter(F.col("zone_id") == "Z1")
    solo = hvac.run_feature_pipeline(one_zone).orderBy("timestamp")
    joint = (
        hvac.run_feature_pipeline(hvac_faulty)
        .filter(F.col("zone_id") == "Z1")
        .orderBy("timestamp")
    )
    a = [tuple(r) for r in solo.collect()]
    b = [tuple(r) for r in joint.collect()]
    assert a == b


# ---------------------------------------------------------------------------
# Scenario-injection detector tests (tests/test_models.py:69-118 pattern)
# ---------------------------------------------------------------------------

def _frame(spark, rows: list[dict]):
    base = {
        "zone_id": "Z1", "ahu_id": "AHU1", "mode": "cooling", "fault_type": "none",
        "temp_error_c": 0.0, "fan_speed_pct": 50.0, "fan_rolling_mean_15min": 50.0,
        "power_kw": 5.0, "power_rolling_mean_60min": 5.0, "temp_change_rate": 0.0,
    }
    t0 = dt.datetime(2024, 1, 1)
    full = []
    for i, r in enumerate(rows):
        d = dict(base)
        d.update(r)
        d["timestamp"] = t0 + dt.timedelta(minutes=5 * i)
        full.append(d)
    return spark.createDataFrame(pd.DataFrame(full))


def test_temp_drift_fires_on_sustained_run(spark):
    rows = [{"temp_error_c": 4.0} for _ in range(8)] + [{"temp_error_c": 0.0}] * 4
    out = detection.temp_drift(_frame(spark, rows)).collect()
    assert len(out) == 8
    assert all(r.rule_name == "temp_drift" and r.severity == "medium" for r in out)
    # score = min(3, |err|/3)
    assert abs(out[0].score - 4.0 / 3.0) < 1e-9


def test_temp_drift_ignores_short_run(spark):
    rows = [{"temp_error_c": 4.0}] * 5 + [{"temp_error_c": 0.0}] * 5
    assert detection.temp_drift(_frame(spark, rows)).count() == 0


def test_temp_drift_high_severity_above_5(spark):
    rows = [{"temp_error_c": 6.0}] * 6
    out = detection.temp_drift(_frame(spark, rows)).collect()
    assert len(out) == 6 and all(r.severity == "high" for r in out)


def test_clogged_filter_fires(spark):
    rows = [{"fan_speed_pct": 85.0, "fan_rolling_mean_15min": 80.0}] * 3
    out = detection.clogged_filter(_frame(spark, rows)).collect()
    assert len(out) == 3
    assert all(r.severity == "high" and r.score == 2.0 for r in out)


def test_compressor_failure_requires_cooling(spark):
    hit = {"power_kw": 1.0, "temp_error_c": 2.0, "power_rolling_mean_60min": 1.0}
    out = detection.compressor_failure(_frame(spark, [hit] * 2)).collect()
    assert len(out) == 2 and all(r.severity == "high" for r in out)
    off = dict(hit, mode="off")
    assert detection.compressor_failure(_frame(spark, [off] * 2)).count() == 0


def test_oscillation_fires_on_alternating_signs(spark):
    rows = [{"temp_change_rate": (1.0 if i % 2 == 0 else -1.0)} for i in range(14)]
    out = detection.oscillating_control(_frame(spark, rows)).collect()
    assert len(out) >= 12
    assert all(r.rule_name == "oscillating_control" for r in out)
    # scalable variant flags a superset
    sup = detection.oscillating_control_window(_frame(spark, rows)).collect()
    assert len(sup) >= len(out) - 11  # overlapping variant covers the same region


def test_oscillation_quiet_on_steady_signal(spark):
    rows = [{"temp_change_rate": 0.5} for _ in range(20)]
    assert detection.oscillating_control(_frame(spark, rows)).count() == 0


# ---------------------------------------------------------------------------
# End-to-end: generate → features → rules + ML → union
# ---------------------------------------------------------------------------

def test_full_pipeline_end_to_end(spark, features):
    from sustainable_building_energy_benchmarking_pipeline_spark.ml.isolation_forest import (
        IsolationForestDetector,
    )

    rules = detection.run_rule_detection(features)
    det = IsolationForestDetector(max_train_rows=5000).train(features)
    ml = det.detect(features)
    allano = rules.unionByName(ml)
    counts = {r.rule_name: r.n for r in allano.groupBy("rule_name").agg(F.count("*").alias("n")).collect()}
    assert counts, "no anomalies detected at all"
    assert "isolation_forest" in counts
    assert any(k in counts for k in ["temp_drift", "clogged_filter", "compressor_failure", "oscillating_control"])
    # anomaly schema domains (tests/test_models.py:237-242)
    row = allano.agg(
        F.min("score").alias("smin"),
        F.count_distinct("severity").alias("nsev"),
    ).collect()[0]
    assert row.smin > 0
    sevs = {r.severity for r in allano.select("severity").distinct().collect()}
    assert sevs <= {"low", "medium", "high"}


def test_if_model_roundtrip(spark, features, tmp_path):
    from sustainable_building_energy_benchmarking_pipeline_spark.ml.isolation_forest import (
        IsolationForestDetector,
    )

    det = IsolationForestDetector(max_train_rows=2000).train(features)
    p = str(tmp_path / "if_model.pkl")
    det.save(p)
    det2 = IsolationForestDetector().load(p)
    a = det.detect(features).count()
    b = det2.detect(features).count()
    assert a == b and a > 0
