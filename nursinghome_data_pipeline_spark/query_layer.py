"""Interactive query layer (SURVEY §3.3): the dashboard operators as
plain engine functions over DataFrames.

Re-expresses ``/root/reference/metrics_dashboard.py`` and
``streamlit_app.py`` minus the UI: filter domains, filtered slices,
group means, quarter×facility pivot, numeric profiling, previews.
The interactive pattern (re-run aggregates per widget change) is where
``.cache()`` matters — callers should cache the base slice once.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

log = logging.getLogger(__name__)


def distinct_values(df: DataFrame, column: str) -> list:
    """A8 + O1: sorted non-null distinct domain for a filter widget
    (metrics_dashboard.py:20-23)."""
    rows = df.select(column).na.drop().distinct().orderBy(column).collect()
    return [r[0] for r in rows]


def filter_metrics(df: DataFrame, *, state: str, provnums: list) -> DataFrame:
    """P16: equality + IN filter (metrics_dashboard.py:25)."""
    return df.where((F.col("STATE") == state) & F.col("PROVNUM").isin(provnums))


def group_mean(df: DataFrame, key: str, value: str) -> DataFrame:
    """A4 + O2: mean of ``value`` per ``key``, sorted by key
    (metrics_dashboard.py:28-30,43-46)."""
    return df.groupBy(key).agg(F.avg(value).alias(f"avg_{value}")).orderBy(key)


def quarter_facility_pivot(
    df: DataFrame,
    *,
    index: str = "CY_Qtr",
    columns: str = "PROVNUM",
    value: str = "total_nurse_hours",
    column_values: list | None = None,
    max_columns: int = 1000,
) -> DataFrame:
    """A5: pivot_table(index, columns, values, aggfunc=sum), sorted
    (metrics_dashboard.py:34-39).

    Pass ``column_values`` when known — it skips a distinct-values job
    AND bounds the output schema (required practice at scale: a pivot
    column per facility across a 100 TB corpus is a million-column
    plan). Without it, the dynamic path warns, computes the sorted
    distinct domain itself, and REFUSES beyond ``max_columns`` rather
    than silently building an unplannable wide schema."""
    if column_values is None:
        log.warning(
            "quarter_facility_pivot: no column_values passed — running a "
            "distinct-values job over %r (capped at %d). Pass the known "
            "domain explicitly in production.",
            columns,
            max_columns,
        )
        vals = [
            r[0]
            for r in df.select(columns)
            .na.drop()
            .distinct()
            .limit(max_columns + 1)
            .collect()
        ]
        if len(vals) > max_columns:
            raise ValueError(
                f"pivot domain of {columns!r} exceeds max_columns="
                f"{max_columns}; pass column_values (or raise the cap) "
                "to make the wide plan an explicit decision"
            )
        column_values = sorted(vals)
    return df.groupBy(index).pivot(columns, column_values).sum(value).orderBy(index)


def numeric_columns(df: DataFrame) -> list[str]:
    """P17: select_dtypes(include=['number']) (streamlit_app.py:34)."""
    return [f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)]


def numeric_means(df: DataFrame) -> DataFrame:
    """A7: one-pass means of every numeric column (streamlit_app.py:34-37).

    A table with NO numeric columns (all-string inferred CSVs are
    common) yields one empty-schema row rather than crashing — agg()
    rejects an empty expression list."""
    cols = numeric_columns(df)
    if not cols:
        return df.sparkSession.range(1).select()
    return df.agg(*[F.avg(c).alias(c) for c in cols])


def preview(df: DataFrame, n: int = 5) -> DataFrame:
    """H1/O3: LIMIT-n preview (streamlit_app.py:32)."""
    return df.limit(n)
