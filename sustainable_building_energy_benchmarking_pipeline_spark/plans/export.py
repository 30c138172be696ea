"""Canonical nested-JSON export (S10/P16; reference ``src/export_json.py``)
and its validator (``src/validate_json.py``).

The reference iterates pandas rows on the driver; here the per-building
records are assembled as column expressions (alias-coalescing resolver,
rating ladder, CO₂ derivation) and the portfolio summary is one aggregate
job — only the final bounded document is collected. ``energy_percentile``
is computed properly via percent_rank when absent (SURVEY W9: "a genuine
gap worth implementing"), instead of the reference's constant 50.
"""

from __future__ import annotations

import datetime as _dt
import json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sustainable_building_energy_benchmarking_pipeline_spark.functions.scalar import (
    coalesce_aliases,
    split_trim,
)
from sustainable_building_energy_benchmarking_pipeline_spark.operators.windows import (
    _global_rank0,
    distributed_percent_rank,
)

PIPELINE_NAME = "sustainable_building_benchmarking"

BENCHMARK_CATEGORIES = {
    "energy_intensity": {
        "excellent": "< 70 kWh/m²",
        "good": "70-90 kWh/m²",
        "average": "90-110 kWh/m²",
        "poor": "> 110 kWh/m²",
    },
    "co2_intensity": {
        "excellent": "< 15 kg/m²",
        "good": "15-20 kg/m²",
        "average": "20-25 kg/m²",
        "poor": "> 25 kg/m²",
    },
}  # src/export_json.py:55-68

# column-alias groups (src/export_json.py:91-101)
_ALIASES = {
    "id": ["building_id", "id", "property_id", "bldg_id"],
    "name": ["name", "building_name", "property_name"],
    "location": ["location", "city", "address"],
    "area": ["floor_area_m2", "area", "gross_floor_area", "gfa"],
    "type": ["building_type", "type", "use_type", "property_type"],
    "year": ["year_built", "construction_year", "year"],
    "eui": ["eui", "energy_use_intensity", "site_eui", "energy_intensity_kwh_m2"],
    "co2": ["co2_intensity", "carbon_intensity", "co2_kg_m2", "co2_intensity_kg_m2"],
    "pct": ["percentile", "percentile_rank", "energy_percentile"],
    "rating": ["rating", "grade", "energy_class", "performance_rating"],
    "certs": ["certifications", "certificates", "green_certifications"],
}


def resolve_building_records(df: DataFrame) -> DataFrame:
    """Normalize any tolerated input schema to the export building schema
    (the get_col alias-coalescing behavior, src/export_json.py:103-152).

    ``_rn`` (the 1-based fallback row number for absent id/name columns
    and the percentile tiebreak) comes from the distributed two-pass
    rank over a materialized ``monotonically_increasing_id`` — a bare
    ``Window.orderBy(...)`` with no partition key funnels the WHOLE
    input through one task, the exact anti-pattern this module's W9
    note exists to avoid. The mid is materialized as a column FIRST so
    the range exchange and the local sort see the same values (re-
    evaluating a nondeterministic expression per stage would not).
    Same caveat as before: mid depends on the input partition layout,
    so fallback ids are stable per materialized plan, not across
    repartitionings — callers needing durable ids must supply one."""
    ranked, _total = _global_rank0(df.withColumn("_mid0", F.monotonically_increasing_id()), ["_mid0"])
    if ranked is None:  # empty input: keep the schema contract
        out = df.withColumn("_rn", F.lit(None).cast("long"))
    else:
        out = ranked.withColumn("_rn", F.col("_rn0") + 1).drop("_rn0", "_mid0")

    def col_of(key: str, default=None):
        return coalesce_aliases(out, _ALIASES[key], default)

    eui = col_of("eui", 85.0).cast("double")
    co2 = F.coalesce(
        coalesce_aliases(out, _ALIASES["co2"]).cast("double"), F.round(eui * 0.22, 10)
    )
    # F13: case-normalize supplied ratings ("excellent"/"EXCELLENT" →
    # "Excellent") the way the reference's rating.capitalize() does
    # before bucketing (src/export_demo_json.py:188); initcap is the
    # column form for the one-word rating ladder
    rating = F.coalesce(
        F.initcap(coalesce_aliases(out, _ALIASES["rating"]).cast("string")),
        F.when(eui < 70, "Excellent")
        .when(eui < 90, "Good")
        .when(eui < 110, "Average")
        .otherwise("Poor"),
    )
    # percentile: use provided column, else TRUE percent-rank by EUI (W9)
    # via the distributed two-pass CDF — no single-task global window
    # even on this bounded path (operators.windows.distributed_percent_rank)
    pct_present = any(c in out.columns for c in _ALIASES["pct"])
    if pct_present:
        pct = coalesce_aliases(out, _ALIASES["pct"], 50).cast("int")
    else:
        out = distributed_percent_rank(
            out.withColumn("_eui_sort", eui),
            ["_eui_sort", "_rn"],
            out_col="_pctr",
            scale=100.0,
        )
        pct = F.round(F.col("_pctr")).cast("int")

    # certifications: array column passes through; string column is split
    # on commas and trimmed (F12); absent → empty array
    empty = F.array().cast("array<string>")
    cert_col = next((a for a in _ALIASES["certs"] if a in df.columns), None)
    if cert_col is None:
        certs = empty
    elif dict(df.dtypes)[cert_col].startswith("array"):
        certs = F.coalesce(F.col(cert_col), empty)
    else:
        certs = F.when(
            F.col(cert_col).isNotNull(), split_trim(F.col(cert_col).cast("string"), ",")
        ).otherwise(empty)

    return out.select(
        F.coalesce(col_of("id").cast("string"), F.format_string("BLD-%03d", F.col("_rn"))).alias("building_id"),
        F.coalesce(col_of("name").cast("string"), F.format_string("Building %d", F.col("_rn"))).alias("name"),
        col_of("location", "Stockholm").cast("string").alias("location"),
        F.round(col_of("area", 3000).cast("double"), 0).alias("floor_area_m2"),
        col_of("type", "Office").cast("string").alias("building_type"),
        col_of("year", 2015).cast("int").alias("year_built"),
        F.round(eui, 1).alias("energy_intensity_kwh_m2"),
        F.round(co2, 1).alias("co2_intensity_kg_m2"),
        pct.alias("energy_percentile"),
        rating.alias("rating"),
        certs.alias("certifications"),
    )


def portfolio_summary(buildings: DataFrame) -> dict[str, Any]:
    """Area-weighted portfolio KPIs (A8/A9, src/export_json.py:154-169)."""
    row = buildings.agg(
        F.count("*").alias("n"),
        F.round(F.sum("floor_area_m2"), 0).alias("total_area"),
        F.sum(F.col("energy_intensity_kwh_m2") * F.col("floor_area_m2")).alias("eui_area"),
        F.sum("floor_area_m2").alias("area_sum"),
        F.round(
            F.sum(F.col("co2_intensity_kg_m2") * F.col("floor_area_m2") / 1000), 1
        ).alias("total_co2"),
        F.sum(F.when(F.col("rating").isin("Excellent", "Good"), 1).otherwise(0)).alias("top"),
        F.sum(F.when(F.col("rating") == "Poor", 1).otherwise(0)).alias("poor"),
    ).collect()[0]
    n = row["n"] or 0
    avg_eui = (row["eui_area"] / row["area_sum"]) if row["area_sum"] else 0
    return {
        "total_buildings": n,
        "total_floor_area_m2": float(row["total_area"] or 0),
        "avg_energy_intensity_kwh_m2": round(avg_eui, 1),
        "portfolio_co2_tons": float(row["total_co2"] or 0),
        "top_performer_pct": round(row["top"] / n * 100, 0) if n else 0,
        "needs_improvement_pct": round(row["poor"] / n * 100, 0) if n else 0,
    }


def assemble_export_document(
    df: DataFrame, generated_at: _dt.datetime | None = None
) -> dict[str, Any]:
    """Build the canonical nested document (src/export_json.py:51-70,
    :266-269). ``generated_at`` is injectable for golden tests (SURVEY §7
    'What's hard' #5)."""
    now = generated_at or _dt.datetime.now(_dt.timezone.utc)
    buildings = resolve_building_records(df).cache()
    try:
        doc = {
            "pipeline": PIPELINE_NAME,
            "generated_at": now.isoformat(),
            "portfolio_summary": portfolio_summary(buildings),
            "benchmark_categories": BENCHMARK_CATEGORIES,
            "buildings": [r.asDict(recursive=True) for r in buildings.collect()],
        }
        return doc
    finally:
        buildings.unpersist()


def to_json(doc: dict[str, Any]) -> str:
    return json.dumps(doc, indent=2, default=str)


# ---------------------------------------------------------------------------
# Validation (src/validate_json.py:17-69 semantics)
# ---------------------------------------------------------------------------

REQUIRED_TOP = ["pipeline", "generated_at", "portfolio_summary", "benchmark_categories", "buildings"]
REQUIRED_SUMMARY = [
    "total_buildings", "total_floor_area_m2", "avg_energy_intensity_kwh_m2",
    "portfolio_co2_tons", "top_performer_pct", "needs_improvement_pct",
]
REQUIRED_BUILDING = [
    "building_id", "name", "location", "floor_area_m2", "building_type",
    "year_built", "energy_intensity_kwh_m2", "co2_intensity_kg_m2",
    "energy_percentile", "rating", "certifications",
]


def validate_export_document(doc: dict[str, Any]) -> list[str]:
    """Return list of validation errors (empty = valid)."""
    errors: list[str] = []
    for k in REQUIRED_TOP:
        if k not in doc:
            errors.append(f"missing top-level field: {k}")
    try:
        _dt.datetime.fromisoformat(str(doc.get("generated_at", "")))
    except ValueError:
        errors.append("generated_at is not ISO-8601")
    for k in REQUIRED_SUMMARY:
        if k not in doc.get("portfolio_summary", {}):
            errors.append(f"missing portfolio_summary field: {k}")
    for i, b in enumerate(doc.get("buildings", [])):
        for k in REQUIRED_BUILDING:
            if k not in b:
                errors.append(f"building[{i}] missing field: {k}")
        if not isinstance(b.get("certifications", []), list):
            errors.append(f"building[{i}].certifications is not a list")
    return errors
