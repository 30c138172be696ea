"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os

import pytest

from sustainable_building_energy_benchmarking_pipeline_spark.session import get_spark

TESTDATA_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
ORACLE_SF = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="sbeb-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TESTDATA_SF


@pytest.fixture(scope="session")
def oracle_sf_dir() -> str:
    return ORACLE_SF
