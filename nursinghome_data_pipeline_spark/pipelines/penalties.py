"""Penalties build pipeline: ingest → stage → curate (SURVEY §3.1).

End-to-end re-expression of ``/root/reference/build.py:55-111``:
config-driven CSV ingest, staging tables, duplicate-key audits, then
the curated ``fact_penalty`` table and ``v_penalties_by_state`` view.

Execution shape vs the reference: each dataset is ONE lazy DataFrame
chain (read→conform→union→write) planned by Catalyst — no per-step
materialization; the only shuffles are the dup-check and view group-bys.
The reference's destructive DB rebuild (``ensure_db``, build.py:14-25)
maps to overwrite-mode writes, which are idempotent per table.
"""

from __future__ import annotations

import logging

from pyspark.sql import SparkSession

from ..catalog import create_table_as, create_view, stage_overwrite
from ..config import DatasetSpec, load_config
from ..dq import audit_duplicate_keys
from ..sources.csv_source import ingest_dataset, list_matching_files

log = logging.getLogger(__name__)

#: parity: fact_penalty CTAS, build.py:85-97 (date() normalization is a
#: no-op here — penalty_date is already DATE-typed by declared-cast).
#: The staging table name is substituted from the dataset spec — a
#: hardcoded name would silently read a STALE staging_penalties table
#: (or fail) whenever the config declares a different staging_table.
FACT_PENALTY_SQL = """
  SELECT
    cms_certification_number_ccn AS ccn,
    penalty_date,
    penalty_type,
    COALESCE(fine_amount, 0) AS fine_amount,
    payment_denial_length_in_days AS denial_days,
    state,
    provider_name
  FROM {staging_table}
"""

#: parity: v_penalties_by_state, build.py:98-107 (no-ELSE CASE → NULL
#: fine_count for states with no positive fines, same as SQLite)
PENALTIES_BY_STATE_SQL = """
  SELECT state,
         COUNT(*) AS penalty_events,
         SUM(fine_amount) AS total_fines,
         SUM(CASE WHEN fine_amount > 0 THEN 1 END) AS fine_count,
         ROUND(AVG(fine_amount), 2) AS avg_fine
  FROM fact_penalty
  GROUP BY state
"""


def run_build(
    spark: SparkSession,
    *,
    config_path: str | None = None,
    specs: dict[str, DatasetSpec] | None = None,
    csv_dir: str,
) -> dict[str, int]:
    """Run the full build; returns staged row counts per dataset."""
    if specs is None:
        if config_path is None:
            raise ValueError("pass config_path or specs")
        specs = load_config(config_path)
    staged: dict[str, int] = {}
    for name, spec in specs.items():
        if not list_matching_files(csv_dir, spec.filename_pattern):
            log.warning("no files for dataset %s", name)
            continue
        df = ingest_dataset(spark, spec, csv_dir)
        stage_overwrite(df, spec.staging_table)
        staged[name] = spark.table(spec.staging_table).count()
        if spec.natural_key:
            audit_duplicate_keys(
                spark,
                spark.table(spec.staging_table),
                spec.natural_key,
                table_name=spec.staging_table,
            )
        log.info("loaded %s -> %s rows=%d", name, spec.staging_table, staged[name])
    if "penalties" in specs and "penalties" in staged:
        create_table_as(
            spark,
            "fact_penalty",
            FACT_PENALTY_SQL.format(
                staging_table=specs["penalties"].staging_table
            ),
        )
        create_view(spark, "v_penalties_by_state", PENALTIES_BY_STATE_SQL)
    return staged
