"""spark.sql as a first-class query surface: for every registry query
whose oracle SQL is portable ANSI, running that SQL through SPARK
(tables registered as temp views by session.load_tables) must equal the
DataFrame-API plan — same engine, two front-ends, one answer.

Three oracles (q08, q83, q86) parse in Spark but differ on dialect
edges (rounding/division typing against their DuckDB-targeted text), so
they stay DuckDB-only; the rest of the ~50 non-portable oracles use
DuckDB list/lambda builtins that ANSI doesn't have."""

from __future__ import annotations

import pytest

from sustainable_building_energy_benchmarking_pipeline_spark.plans.analytics import QUERIES
from sustainable_building_energy_benchmarking_pipeline_spark.session import load_tables
from tests.oracle import normalize_result

SF_DIR = "/root/testdata/sf0.001"

SPARK_PORTABLE = [
    "q01_pricing_summary", "q03_segment_revenue", "q05_region_rollup",
    "q06_revenue_delta", "q07_case_bands", "q09_weighted_avg",
    "q10_grouping_sets", "q11_distinct_count", "q12_anti_join",
    "q13_semi_join", "q14_union_tag", "q15_topk_per_group",
    "q16_dedup_first", "q17_rolling_events", "q18_runs",
    "q20_percent_rank", "q21_sessionize", "q22_daily_counts",
    "q23_hourly_profile", "q41_left_enrich", "q42_union_missing_columns",
    "q43_session_windows", "q45_rollup_revenue", "q46_pivot_event_types",
    "q47_oscillation_window", "q48_custom_sort", "q55_latest_state_upsert",
    "q58_unpivot_melt", "q67_fuzzy_name_match", "q68_value_histogram",
    "q71_funnel_stages", "q73_mode_event_type", "q74_ntile_buckets",
    "q75_numeric_correlation", "q79_cube_orders", "q82_intersect_except",
    "q85_zscore_normalize", "q87_wow_growth", "q92_agg_topk",
    "q93_dense_rank_ties",
]


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    load_tables(spark, SF_DIR)


@pytest.mark.parametrize("name", SPARK_PORTABLE)
def test_sql_frontend_matches_dataframe(spark, name):
    spec = QUERIES[name]
    df_api = spec.fn(spark, SF_DIR)
    sql_api = spark.sql(spec.sql)
    a = normalize_result(df_api.columns, [tuple(r) for r in df_api.collect()])
    b = normalize_result(sql_api.columns, [tuple(r) for r in sql_api.collect()])
    assert a == b, f"{name}: SQL front-end diverges from DataFrame plan"
