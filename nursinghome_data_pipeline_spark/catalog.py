"""Catalog & staging layer (SURVEY §2.2 K1-K5, §2.1 S4-S6).

The reference stages into SQLite tables (``build.py:79-80``), curates
with DROP/CTAS/VIEW SQL (``build.py:84-107``), and lists tables from
``sqlite_master`` (``streamlit_app.py:8-12``). Here the warehouse is
Spark's managed Parquet catalog: ``saveAsTable`` for staging,
``spark.sql`` DDL for curation, ``spark.catalog`` for listing.

At 100 TB the same API holds — managed tables become partitioned
Parquet datasets; overwrite mode is atomic per-table via Spark's commit
protocol, which also supplies the reference's idempotent-rerun
semantics (upload_to_s3.py's HEAD/skip dance, K8) for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stage_overwrite(df: DataFrame, table: str) -> None:
    """K1: ``to_sql(..., if_exists='replace')`` → overwrite saveAsTable."""
    df.write.mode("overwrite").format("parquet").saveAsTable(table)


def stage_append(df: DataFrame, table: str) -> None:
    """K2: append-mode metrics/audit table write."""
    df.write.mode("append").format("parquet").saveAsTable(table)


def create_table_as(spark: SparkSession, table: str, select_sql: str) -> None:
    """K4: DROP IF EXISTS + CTAS (build.py:85-97)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"CREATE TABLE {table} USING parquet AS {select_sql}")


def create_view(spark: SparkSession, view: str, select_sql: str) -> None:
    """K5: CREATE OR REPLACE VIEW (build.py:98-107) — lazily evaluated."""
    spark.sql(f"CREATE OR REPLACE VIEW {view} AS {select_sql}")


def list_tables(spark: SparkSession) -> list[str]:
    """S6: catalog scan (sqlite_master → spark.catalog.listTables)."""
    return sorted(t.name for t in spark.catalog.listTables())


def table_preview(spark: SparkSession, table: str, n: int = 5) -> DataFrame:
    """S4 + H1: SELECT * FROM t LIMIT n (streamlit_app.py:15-19,32)."""
    return spark.table(table).limit(n)


AUDIT_TABLE = "dq_audit"
#: parity: dq_audit DDL, build.py:18-24 (id omitted — surrogate keys
#: don't distribute; created_at orders the log)
AUDIT_SCHEMA = (
    "table_name string, check_name string, status string, "
    "metric_value double, threshold double, sample_rows long, "
    "notes string, created_at timestamp"
)


def write_audit_row(
    spark: SparkSession,
    *,
    table_name: str,
    check_name: str,
    status: str,
    metric_value: float,
    threshold: float = 0.0,
    sample_rows: int = 0,
    notes: str | None = None,
    table: str = AUDIT_TABLE,
) -> None:
    """K3: parameterized audit insert (build.py:49-53; DDL :18-24).

    ``created_at`` uses ``current_timestamp()`` (reference:
    ``datetime('now')`` default).
    """
    row = (
        table_name,
        check_name,
        status,
        float(metric_value),
        float(threshold),
        int(sample_rows),
        notes,
    )
    df = spark.createDataFrame(
        [row], schema=AUDIT_SCHEMA.replace(", created_at timestamp", "")
    ).withColumn("created_at", F.current_timestamp())
    spark.sql(f"CREATE TABLE IF NOT EXISTS {table} ({AUDIT_SCHEMA}) USING parquet")
    df.write.mode("append").format("parquet").saveAsTable(table)
