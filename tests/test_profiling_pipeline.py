"""Directory profiling pipeline (load_nursing_home_data parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nursinghome_data_pipeline_spark.pipelines.profiling import profile_directory


def test_profile_directory(spark, tmp_path):
    (tmp_path / "My Facility Data.csv").write_text("A Col,B Col\n1,\n2,x\n")
    (tmp_path / "other.csv").write_text("q,r\n7,8\n")
    counts = profile_directory(spark, str(tmp_path))
    assert counts == {"my_facility_data": 2, "other": 1}
    # staged under normalized stem (load_nursing_home_data.py:9-17)
    assert spark.table("my_facility_data").count() == 2
    prof = spark.table("dq_completeness").where(
        F.col("table_name") == "my_facility_data"
    )
    rows = {r.column_name: r for r in prof.collect()}
    assert rows["B Col"].pct_not_null == 50.0
    assert rows["A Col"].non_null_count == 2
