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
    # r15 (driver pytest-gate runtime, VERDICT item 2): cap
    # default.parallelism at 8 — every tiny createDataFrame/parallelize
    # in the suite otherwise fans out to local[32]'s 32 slices, so each
    # of the suite's thousands of small writes paid 32 tasks + 32 part
    # files + 32 footer-stat reads. Semantics are the 4-shard
    # SPARK_GRAFT_CPUS=8 configuration the suite has always passed
    # under (local[8] implies defaultParallelism 8); thread count
    # stays at the local[N] master for concurrent-job tests.
    s = get_spark("tests", extra_conf={
        "spark.sql.shuffle.partitions": "8",
        "spark.default.parallelism": "8",
    })
    yield s


@pytest.fixture()
def tmp_warehouse():
    d = tempfile.mkdtemp(prefix="lakehouse_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
