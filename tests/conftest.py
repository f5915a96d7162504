from __future__ import annotations

import os
import tempfile

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from nursinghome_data_pipeline_spark.session import build_session

    warehouse = tempfile.mkdtemp(prefix="spark-warehouse-")
    spark = build_session(
        "tests",
        driver_memory="8g",
        extra={"spark.sql.warehouse.dir": warehouse},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
