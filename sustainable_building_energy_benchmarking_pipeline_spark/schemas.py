"""Explicit StructType schema registry.

The reference mostly infers schemas (pandas dtype inference,
``benchmarking/model.py:110-113``) except its medallion notebook, which pins
an explicit schema and disables inference
(``notebooks/benchmarking_medallion.py:71-89``). We follow the notebook:
every table in the engine has a declared schema; inference is never used on
the hot path (an inference pass is an extra full scan at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Benchmarking: buildings raw table (generate_sample_data.py:33-44,
# notebooks/benchmarking_medallion.py:71-80) ---
BUILDINGS_RAW = T.StructType([
    T.StructField("building_id", T.StringType(), False),
    T.StructField("building_type", T.StringType(), True),
    T.StructField("area", T.DoubleType(), True),
    T.StructField("year_built", T.IntegerType(), True),
    T.StructField("energy_consumption", T.DoubleType(), True),
    T.StructField("occupancy", T.IntegerType(), True),
    T.StructField("has_hvac", T.BooleanType(), True),
    T.StructField("has_solar", T.BooleanType(), True),
])

# --- HVAC raw sensor time-series (src/generate_hvac_data.py:74-89) ---
HVAC_RAW = T.StructType([
    T.StructField("timestamp", T.TimestampType(), False),
    T.StructField("zone_id", T.StringType(), False),
    T.StructField("ahu_id", T.StringType(), True),
    T.StructField("temp_zone_c", T.DoubleType(), True),
    T.StructField("rh_zone_pct", T.DoubleType(), True),
    T.StructField("supply_air_temp_c", T.DoubleType(), True),
    T.StructField("return_air_temp_c", T.DoubleType(), True),
    T.StructField("power_kw", T.DoubleType(), True),
    T.StructField("fan_speed_pct", T.DoubleType(), True),
    T.StructField("setpoint_c", T.DoubleType(), True),
    T.StructField("mode", T.StringType(), True),
    T.StructField("fault_type", T.StringType(), True),
])

# 16 engineered feature columns appended by the HVAC ETL
# (src/pipeline_batch.py:92-158); raw 12 + 16 = 28 columns.
HVAC_FEATURE_COLS = [
    "temp_error_c",
    "delta_return_supply",
    "temp_error_rolling_mean_15min",
    "temp_error_rolling_std_15min",
    "temp_error_rolling_mean_60min",
    "temp_error_rolling_std_60min",
    "power_rolling_mean_15min",
    "power_rolling_std_15min",
    "power_rolling_mean_60min",
    "power_rolling_std_60min",
    "fan_rolling_mean_15min",
    "temp_zone_c_lag1",
    "power_kw_lag1",
    "fan_speed_pct_lag1",
    "temp_change_rate",
    "power_change_rate",
]

HVAC_FEATURES = T.StructType(
    list(HVAC_RAW.fields)
    + [T.StructField(c, T.DoubleType(), True) for c in HVAC_FEATURE_COLS]
)

# --- Anomaly event log (src/models.py:59-62, src/db.py:29-42) ---
ANOMALIES = T.StructType([
    T.StructField("timestamp", T.TimestampType(), False),
    T.StructField("zone_id", T.StringType(), False),
    T.StructField("ahu_id", T.StringType(), True),
    T.StructField("metric", T.StringType(), True),
    T.StructField("score", T.DoubleType(), True),
    T.StructField("rule_name", T.StringType(), False),
    T.StructField("severity", T.StringType(), True),
    T.StructField("fault_type_label", T.StringType(), True),
    T.StructField("created_at", T.TimestampType(), True),
])

# --- Canonical nested export document (src/export_json.py:51-70; FIXTURES §5) ---
EXPORT_BUILDING = T.StructType([
    T.StructField("building_id", T.StringType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("location", T.StringType(), True),
    T.StructField("floor_area_m2", T.DoubleType(), True),
    T.StructField("building_type", T.StringType(), True),
    T.StructField("year_built", T.IntegerType(), True),
    T.StructField("energy_intensity_kwh_m2", T.DoubleType(), True),
    T.StructField("co2_intensity_kg_m2", T.DoubleType(), True),
    T.StructField("energy_percentile", T.IntegerType(), True),
    T.StructField("rating", T.StringType(), True),
    T.StructField("certifications", T.ArrayType(T.StringType()), True),
])

EXPORT_DOCUMENT = T.StructType([
    T.StructField("pipeline", T.StringType(), False),
    T.StructField("generated_at", T.StringType(), False),
    T.StructField("portfolio_summary", T.StructType([
        T.StructField("total_buildings", T.IntegerType(), False),
        T.StructField("total_floor_area_m2", T.DoubleType(), True),
        T.StructField("avg_energy_intensity_kwh_m2", T.DoubleType(), True),
        T.StructField("portfolio_co2_tons", T.DoubleType(), True),
        T.StructField("top_performer_pct", T.DoubleType(), True),
        T.StructField("needs_improvement_pct", T.DoubleType(), True),
    ]), False),
    T.StructField("buildings", T.ArrayType(EXPORT_BUILDING), False),
])
