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
    # Cross-config robustness knob: the external driver runs queries
    # under ITS session, not ours, so results must not depend on this
    # suite's pinned confs. `SPARK_GRAFT_TEST_EXTRA` injects overrides
    # (JSON object of spark confs) — e.g. ANSI on, a prime shuffle
    # width, AQE off — and the whole suite must stay green:
    #   SPARK_GRAFT_TEST_EXTRA='{"spark.sql.ansi.enabled":"true",
    #     "spark.sql.shuffle.partitions":"7",
    #     "spark.sql.adaptive.enabled":"false"}' pytest tests/
    extra = {"spark.sql.warehouse.dir": warehouse}
    override = os.environ.get("SPARK_GRAFT_TEST_EXTRA")
    if override:
        import json

        extra.update(json.loads(override))
    spark = build_session("tests", driver_memory="8g", extra=extra)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
