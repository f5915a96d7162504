"""Data-quality module (SURVEY §2.5 A2/A6/A9, §2.2 K3).

Re-expresses the reference's runtime DQ checks:

- duplicate-natural-key audit (``build.py:39-53``);
- per-column completeness profiling (``load_nursing_home_data.py:20-36``);
- drop/warn counters without extra passes (``calculate_metrics.py``'s
  logged counts) via ``df.observe`` — an accumulator-style observation
  that rides the existing action instead of forcing a second scan,
  which is the difference between 1× and 2× total I/O at 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .catalog import write_audit_row


@dataclass
class DupCheckResult:
    dup_key_count: int
    sample_json: str | None


def duplicate_key_check(
    df: DataFrame, keys: list[str] | tuple[str, ...], *, sample_rows: int = 5
) -> DupCheckResult:
    """A2: GROUP BY natural key HAVING COUNT(*)>1, with a small JSON
    sample of offending keys (parity: build.py:39-53 head().to_json())."""
    dups = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )
    sample = dups.limit(sample_rows).select(
        F.to_json(F.struct(*[F.col(k) for k in keys], F.col("n"))).alias("j")
    )
    rows = sample.collect()
    # one aggregate job for the count; the sample rides a limit() job
    n = dups.count()
    return DupCheckResult(
        dup_key_count=n,
        sample_json="[" + ",".join(r.j for r in rows) + "]" if rows else None,
    )


def audit_duplicate_keys(
    spark: SparkSession,
    df: DataFrame,
    keys: list[str] | tuple[str, ...],
    *,
    table_name: str,
    threshold: float = 0.0,
) -> DupCheckResult:
    """Run A2 and append the K3 audit row.

    Parity: build.py:39-53 — check name ``dup_<keys>``, status
    'ok'/'warn', metric = duplicate-key count, 5-row JSON sample.
    """
    res = duplicate_key_check(df, keys)
    write_audit_row(
        spark,
        table_name=table_name,
        check_name="dup_" + "_".join(keys),
        status="warn" if res.dup_key_count > threshold else "ok",
        metric_value=float(res.dup_key_count),
        threshold=threshold,
        sample_rows=min(res.dup_key_count, 5),
        notes=res.sample_json,
    )
    return res


def completeness_profile(df: DataFrame, *, table_name: str) -> DataFrame:
    """A6: one-pass per-column completeness (row_count, non_null_count,
    pct_not_null), long format, for the ``dq_completeness`` table
    (load_nursing_home_data.py:20-36,41-49). pct is 0 for empty input."""
    cols = df.columns
    agg = df.agg(
        F.count(F.lit(1)).alias("row_count"),
        *[F.count(F.col(c)).alias(f"nn_{i}") for i, c in enumerate(cols)],
    )
    # index-based aliases + escaped literals: column names may contain
    # spaces/quotes (raw CSV headers are profiled before normalization)
    stack_args = ", ".join(
        "'{}', nn_{}".format(c.replace("'", "''"), i) for i, c in enumerate(cols)
    )
    return agg.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (column_name, non_null_count)",
        "row_count",
    ).select(
        F.lit(table_name).alias("table_name"),
        "column_name",
        "row_count",
        "non_null_count",
        F.when(F.col("row_count") == 0, F.lit(0.0))
        .otherwise(
            F.col("non_null_count").cast("double") * 100 / F.col("row_count")
        )
        .alias("pct_not_null"),
    )


def observe_counts(df: DataFrame, name: str, **conditions: F.Column):
    """Attach named conditional counters that ride the next action.

    Returns ``(df, observation)``; read the metrics AFTER an action
    runs, via ``functions.obs.get_metrics`` (bounded wait — a lost
    listener event must not hang the caller). Replaces the reference's eager ``len(df)`` logging
    (calculate_metrics.py:100,109,145 — each a full extra pass in
    pandas) with zero-extra-pass metrics.
    """
    obs = Observation(name)
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).alias(key)
        for key, cond in conditions.items()
    ] or [F.count(F.lit(1)).alias("rows")]
    return df.observe(obs, *aggs), obs
