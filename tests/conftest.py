"""Shared fixtures, mirroring the reference's isolation style
(reference tests/conftest.py:16-36: throwaway catalog per test) — here a
session-scoped SparkSession plus per-test temp warehouse dirs."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from iceberg_lakehouse_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture()
def tmp_warehouse():
    d = tempfile.mkdtemp(prefix="lakehouse_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
