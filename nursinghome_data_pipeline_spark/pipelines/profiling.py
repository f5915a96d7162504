"""Directory profiling pipeline (SURVEY §2.1 S2, §2.5 A6, §2.2 K1/K2).

Re-expression of ``/root/reference/load_nursing_home_data.py``: load
every CSV in a directory with schema inference, stage each as a table
named from its normalized file stem, and append per-column completeness
metrics to ``dq_completeness``.
"""

from __future__ import annotations

import logging

from pyspark.sql import SparkSession

from ..catalog import stage_append, stage_overwrite
from ..dq import completeness_profile
from ..sources.csv_source import read_inferred_csvs

log = logging.getLogger(__name__)

COMPLETENESS_TABLE = "dq_completeness"


def profile_directory(
    spark: SparkSession, directory: str, *, stage_tables: bool = True
) -> dict[str, int]:
    """Load + stage + profile every CSV; returns row counts per table."""
    counts: dict[str, int] = {}
    for stem, df in read_inferred_csvs(spark, directory).items():
        prof = completeness_profile(df, table_name=stem)
        stage_append(prof, COMPLETENESS_TABLE)
        if stage_tables:
            stage_overwrite(df, stem)
            counts[stem] = spark.table(stem).count()
        else:
            counts[stem] = df.count()
        log.info("profiled %s rows=%d", stem, counts[stem])
    return counts
