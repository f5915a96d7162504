"""End-to-end penalties build (ingest → stage → curate), FIXTURES.md §1.

Pins the reference behaviors: multi-file union with missing-column
padding, coerce-to-null casts, lineage columns, duplicate-key audit,
COALESCE(fine,0) in the fact, no-ELSE CASE in the view.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from nursinghome_data_pipeline_spark.config import specs_from_dict
from nursinghome_data_pipeline_spark.pipelines.penalties import run_build

CONFIG = {
    "datasets": {
        "penalties": {
            "filename_pattern": "NH_Penalties_*.csv",
            "staging_table": "staging_penalties",
            "natural_key": [
                "cms_certification_number_ccn",
                "penalty_date",
                "penalty_type",
            ],
            "columns": {
                "cms_certification_number_ccn": {"type": "string"},
                "penalty_date": {"type": "date"},
                "penalty_type": {"type": "string"},
                "fine_amount": {"type": "numeric"},
                "payment_denial_length_in_days": {"type": "int", "nullable": True},
                "state": {"type": "string"},
                "provider_name": {"type": "string"},
            },
        }
    }
}

FILE_A = """CMS Certification Number (CCN),Penalty Date,Penalty Type,Fine Amount,Payment Denial Length in Days,State,Provider Name
015009,01/15/2024,Fine,10000.50,,AL,"Smith, Jones & Co"
015009,01/15/2024,Fine,2000,,AL,Duplicate Key Row
025010,bad-date,Fine,500,,TX,Bad Date Home
035011,02/20/2024,Payment Denial,,30,TX,Denial Home
045012,03/01/2024,Fine,0,,CA,Zero Fine Home
"""

# second file lacks the denial-days column → NULL padding (build.py:73-74)
FILE_B = """CMS Certification Number (CCN),Penalty Date,Penalty Type,Fine Amount,State,Provider Name
055013,04/05/2024,Fine,750.25,NY,Empire Care
"""


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    csv_dir = tmp_path_factory.mktemp("penalties_csvs")
    (csv_dir / "NH_Penalties_a.csv").write_text(FILE_A)
    (csv_dir / "NH_Penalties_b.csv").write_text(FILE_B)
    staged = run_build(
        spark, specs=specs_from_dict(CONFIG), csv_dir=str(csv_dir)
    )
    return staged


def test_staging_rows_and_schema(spark, built):
    assert built == {"penalties": 6}
    st = spark.table("staging_penalties")
    assert dict(st.dtypes)["penalty_date"] == "date"
    assert dict(st.dtypes)["fine_amount"] == "double"
    assert dict(st.dtypes)["payment_denial_length_in_days"] == "bigint"
    # leading zeros survive string typing (FIXTURES §1)
    ccns = {r[0] for r in st.select("cms_certification_number_ccn").collect()}
    assert "015009" in ccns and "055013" in ccns


def test_coerce_and_padding(spark, built):
    st = spark.table("staging_penalties")
    bad_date = st.where(F.col("cms_certification_number_ccn") == "025010").first()
    assert bad_date.penalty_date is None  # unparseable → NULL (coerce)
    padded = st.where(F.col("cms_certification_number_ccn") == "055013").first()
    assert padded.payment_denial_length_in_days is None  # column absent in file B
    assert padded.penalty_date == datetime.date(2024, 4, 5)
    assert padded.source_file == "NH_Penalties_b.csv"
    assert padded.ingestion_date == datetime.date.today()


def test_fact_penalty_coalesce(spark, built):
    fact = spark.table("fact_penalty")
    assert fact.count() == 6
    denial = fact.where(F.col("ccn") == "035011").first()
    assert denial.fine_amount == 0.0  # COALESCE(fine_amount, 0)
    assert denial.denial_days == 30


def test_view_penalties_by_state(spark, built):
    rows = {
        r.state: r
        for r in spark.table("v_penalties_by_state").collect()
    }
    assert rows["AL"].penalty_events == 2
    assert rows["AL"].total_fines == pytest.approx(12000.50)
    assert rows["AL"].fine_count == 2
    assert rows["AL"].avg_fine == pytest.approx(6000.25)
    # no positive fines → no-ELSE CASE yields NULL, not 0 (SURVEY §4.3 #6)
    assert rows["CA"].fine_count is None
    assert rows["CA"].total_fines == 0.0


def test_duplicate_key_audit(spark, built):
    audit = spark.table("dq_audit").where(
        F.col("table_name") == "staging_penalties"
    ).first()
    assert audit.status == "warn"
    assert audit.metric_value == 1.0  # one duplicated natural key
    assert audit.notes and "015009" in audit.notes
