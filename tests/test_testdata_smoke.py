"""Testdata-drift smoke test.

Round 2 lost ~20 queries and 43 tests to a single silent testdata schema
change (events.ts nanos-as-long -> TIMESTAMP(MICROS)). This test loads every
driver table once and pins the load-layer invariants, so the next drift fails
here with a named message instead of as AnalysisExceptions across the suite.
"""

from __future__ import annotations

import os

import pytest

from sustainable_building_energy_benchmarking_pipeline_spark.session import (
    EXPECTED_TESTDATA_COLUMNS,
    load_table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")

TABLES = sorted(EXPECTED_TESTDATA_COLUMNS)


@pytest.mark.parametrize("name", TABLES)
def test_table_loads_with_expected_columns(spark, name):
    path = os.path.join(SF_DIR, f"{name}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    df = load_table(spark, SF_DIR, name)
    missing = EXPECTED_TESTDATA_COLUMNS[name] - set(df.columns)
    assert not missing, f"{name} missing {sorted(missing)}"
    # one-row materialization proves the physical read path, not just analysis
    assert df.limit(1).collect() is not None


def test_events_ts_is_session_tz_timestamp(spark):
    """The events loader must normalize every shipped physical layout of ts
    (nanos-as-long bigint, timestamp_ntz, plain timestamp) to TimestampType."""
    df = load_table(spark, SF_DIR, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    row = df.select("ts").limit(1).collect()
    assert row and row[0][0] is not None


def test_load_table_memoizes_within_session(spark):
    a = load_table(spark, SF_DIR, "region")
    b = load_table(spark, SF_DIR, "region")
    assert a is b
