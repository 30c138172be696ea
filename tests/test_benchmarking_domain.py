"""Benchmarking-domain parity tests (reference tests/test_benchmarking.py
goldens + medallion pipeline + export document + serving queries)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sustainable_building_energy_benchmarking_pipeline_spark.plans import (
    benchmarking as bm,
    export as ex,
    serving,
)
from sustainable_building_energy_benchmarking_pipeline_spark.schemas import BUILDINGS_RAW
from sustainable_building_energy_benchmarking_pipeline_spark.sources.generators import (
    generate_buildings,
)


@pytest.fixture(scope="module")
def buildings(spark):
    return generate_buildings(spark, n=100).cache()


@pytest.fixture(scope="module")
def silver(buildings):
    return bm.to_silver(buildings, current_year=2024).cache()


# --- scalar scoring goldens (tests/test_benchmarking.py:15-74) ---

def test_benchmark_golden_eui():
    r = bm.benchmark_building(
        {"building_id": "B001", "area": 1000, "energy_consumption": 50000}
    )
    assert r["eui"] == 50.0 and r["performance_rating"] == "Good"


def test_benchmark_golden_poor():
    r = bm.benchmark_building({"building_id": "B2", "area": 100, "energy_consumption": 25000})
    assert r["eui"] == 250.0 and r["performance_rating"] == "Poor"


def test_benchmark_zero_area_guard():
    r = bm.benchmark_building({"building_id": "B3", "area": 0, "energy_consumption": 1000})
    assert r["eui"] == 0


def test_benchmark_df_matches_scalar(spark):
    rows = [
        ("B001", "office", 1000.0, 2000, 50000.0, 10, True, False),
        ("B002", "retail", 100.0, 2000, 25000.0, 10, True, False),
        ("B003", "office", 0.0, 2000, 1000.0, 10, True, False),
    ]
    df = spark.createDataFrame(rows, BUILDINGS_RAW)
    got = {r.building_id: r for r in bm.benchmark_buildings_df(df).collect()}
    for r in rows:
        scalar = bm.benchmark_building(
            {"building_id": r[0], "area": r[2], "energy_consumption": r[4]}
        )
        assert got[r[0]].eui == scalar["eui"]
        assert got[r[0]].performance_rating == scalar["performance_rating"]


# --- medallion (notebooks/benchmarking_medallion.py parity) ---

def test_silver_derivations(silver):
    bad = silver.filter(
        F.abs(F.col("eui") - F.round(F.col("energy_consumption") / F.col("area"), 2)) > 1e-9
    ).count()
    assert bad == 0
    cats = {r.performance_category for r in silver.select("performance_category").distinct().collect()}
    assert cats <= {"Excellent", "Good", "Average", "Poor"}
    assert silver.filter(F.col("area") <= 0).count() == 0


def test_silver_rating_thresholds(spark):
    rows = [
        ("A", "office", 100.0, 2020, 5000.0, 1, True, False),    # eui 50 → Excellent
        ("B", "office", 100.0, 2020, 12000.0, 1, True, False),   # 120 → Good
        ("C", "office", 100.0, 2020, 18000.0, 1, True, False),   # 180 → Average
        ("D", "office", 100.0, 2020, 25000.0, 1, True, False),   # 250 → Poor
    ]
    df = spark.createDataFrame(rows, BUILDINGS_RAW)
    got = {r.building_id: r.performance_category for r in bm.to_silver(df, 2024).collect()}
    assert got == {"A": "Excellent", "B": "Good", "C": "Average", "D": "Poor"}


def test_gold_tables(silver):
    by_type = bm.gold_portfolio_by_type(silver)
    rows = by_type.collect()
    assert 0 < len(rows) <= 5
    assert rows[0].building_count > 0
    total = sum(r.building_count for r in rows)
    assert total == silver.count()
    # hvac_percentage consistent
    for r in rows:
        assert abs(r.hvac_percentage - round(r.hvac_count / r.building_count * 100, 1)) < 1e-9

    perf = bm.gold_performance_distribution(silver).collect()
    order = [r.performance_category for r in perf]
    expected_order = [c for c in ["Excellent", "Good", "Average", "Poor"] if c in order]
    assert order == expected_order

    top = bm.gold_top_efficient(silver).collect()
    assert len(top) == 10
    euis = [r.eui for r in top]
    assert euis == sorted(euis)

    totals = bm.portfolio_totals(silver)
    assert totals["total_buildings"] == silver.count()


# --- export document (src/export_json.py + validate_json.py) ---

def test_export_document_valid(silver):
    doc = ex.assemble_export_document(
        silver, generated_at=dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc)
    )
    assert ex.validate_export_document(doc) == []
    assert doc["generated_at"] == "2024-06-01T00:00:00+00:00"
    assert doc["portfolio_summary"]["total_buildings"] == len(doc["buildings"])
    b = doc["buildings"][0]
    assert isinstance(b["certifications"], list)
    assert 0 <= b["energy_percentile"] <= 100


def test_export_alias_coalescing(spark):
    """Alternate column names resolve to the same document schema (P16)."""
    df = spark.createDataFrame(
        [("X1", "Oslo", 2500.0, "Retail", 2010, 95.0, "LEED, BREEAM")],
        ["property_id", "city", "gross_floor_area", "use_type", "construction_year",
         "site_eui", "certificates"],
    )
    doc = ex.assemble_export_document(df)
    b = doc["buildings"][0]
    assert b["building_id"] == "X1"
    assert b["location"] == "Oslo"
    assert b["floor_area_m2"] == 2500.0
    assert b["building_type"] == "Retail"
    assert b["year_built"] == 2010
    assert b["rating"] == "Average"  # 95 → Average on the 70/90/110 ladder
    assert b["certifications"] == ["LEED", "BREEAM"]
    assert b["co2_intensity_kg_m2"] == round(95.0 * 0.22, 1)


def test_export_rating_case_normalized(spark):
    """F13: supplied ratings are capitalize()-normalized like the
    reference's bucketing (src/export_demo_json.py:188)."""
    df = spark.createDataFrame(
        [("X1", "Oslo", 100.0, "Office", 2010, 95.0, "excellent"),
         ("X2", "Oslo", 100.0, "Office", 2010, 95.0, "POOR")],
        ["building_id", "city", "area_m2", "building_type", "year_built",
         "eui", "rating"],
    )
    doc = ex.assemble_export_document(df)
    ratings = {b["building_id"]: b["rating"] for b in doc["buildings"]}
    assert ratings == {"X1": "Excellent", "X2": "Poor"}


def test_export_validation_catches_missing():
    assert ex.validate_export_document({"pipeline": "x"})  # many errors
    errs = ex.validate_export_document(
        {
            "pipeline": "p", "generated_at": "not-a-date",
            "portfolio_summary": {}, "benchmark_categories": {}, "buildings": [{}],
        }
    )
    assert any("ISO-8601" in e for e in errs)
    assert any("building[0]" in e for e in errs)


# --- serving (src/db.py / src/api.py behavior) ---

@pytest.fixture(scope="module")
def anomalies(spark):
    import pandas as pd

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(200):
        rows.append(
            {
                "timestamp": t0 + dt.timedelta(minutes=5 * i),
                "zone_id": f"Z{i % 4 + 1}",
                "ahu_id": "AHU1",
                "metric": "temp_zone_c",
                "score": 1.0 + (i % 10) / 10,
                "rule_name": ["temp_drift", "clogged_filter"][i % 2],
                "severity": ["low", "medium", "high"][i % 3],
                "fault_type_label": "none",
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows)).cache()


def test_query_anomalies_filters_and_limit(anomalies):
    out = serving.query_anomalies(anomalies, limit=10, severity="high")
    rows = out.collect()
    assert len(rows) == 10
    assert all(r.severity == "high" for r in rows)
    ts = [r.timestamp for r in rows]
    assert ts == sorted(ts, reverse=True)  # ORDER BY timestamp DESC


def test_query_anomalies_limit_bounds(anomalies):
    assert serving.query_anomalies(anomalies, limit=999999).count() == 200  # capped at 5000
    assert serving.query_anomalies(anomalies, limit=-5).count() == 1  # floor 1


def test_query_anomalies_time_window(anomalies):
    out = serving.query_anomalies(
        anomalies,
        start_time="2024-01-01 01:00:00",
        end_time="2024-01-01 02:00:00",
        limit=5000,
    )
    rows = out.collect()
    assert rows
    for r in rows:
        assert dt.datetime(2024, 1, 1, 1) <= r.timestamp <= dt.datetime(2024, 1, 1, 2)


def test_anomaly_summary_one_pass(anomalies):
    s = serving.anomaly_summary(anomalies)
    assert s["total_anomalies"] == 200
    assert sum(s["by_severity"].values()) == 200
    assert sum(s["by_rule"].values()) == 200
    assert set(s["by_severity"]) == {"low", "medium", "high"}
    assert len(s["by_zone"]) <= 10
    # filtered summary
    s2 = serving.anomaly_summary(anomalies, rule_name="temp_drift")
    assert s2["total_anomalies"] == 100
    assert set(s2["by_rule"]) == {"temp_drift"}


def test_format_alerts_iso(anomalies):
    alerts = serving.format_alerts(serving.query_anomalies(anomalies, limit=3))
    assert len(alerts) == 3
    dt.datetime.fromisoformat(alerts[0]["timestamp"])


def test_stat_tiles_parity_with_pandas(anomalies):
    """W8 dashboard tiles (src/dashboard_app.py:270-294): parity with a
    pandas recomputation on the same fixture."""
    tiles = serving.stat_tiles(anomalies)
    pdf = anomalies.toPandas()
    assert tiles["total_anomalies"] == len(pdf)
    assert tiles["high_severity"] == int((pdf["severity"] == "high").sum())
    rule_counts = pdf["rule_name"].value_counts()
    top_rules = rule_counts[rule_counts == rule_counts.max()].index
    assert tiles["top_rule"]["name"] == sorted(top_rules)[0]
    assert tiles["top_rule"]["count"] == int(rule_counts.max())
    zone_counts = pdf["zone_id"].value_counts()
    top_zones = zone_counts[zone_counts == zone_counts.max()].index
    assert tiles["top_zone"]["name"] == sorted(top_zones)[0]
    assert tiles["top_zone"]["count"] == int(zone_counts.max())
    # filtered tiles restrict every dimension
    t2 = serving.stat_tiles(anomalies, severity="high")
    assert t2["total_anomalies"] == t2["high_severity"]


def test_stat_tiles_empty(spark, anomalies):
    empty = anomalies.limit(0)
    tiles = serving.stat_tiles(empty)
    assert tiles == {
        "total_anomalies": 0,
        "high_severity": 0,
        "top_rule": None,
        "top_zone": None,
    }
