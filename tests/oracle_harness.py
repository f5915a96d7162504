"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registry query in Spark and its oracle SQL in DuckDB on the same
parquet tables, then compares row count, column names, and exact values
(columns sorted by name, rows sorted by all columns) — a stricter local
stand-in for the driver's order-insensitive value-hash.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from nursinghome_data_pipeline_spark.sources.tpch import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(list(df.columns), na_position="first").reset_index(
            drop=True
        )
    return df.reset_index(drop=True)


def compare(spark_df, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    got = _normalize(spark_df.toPandas())
    exp = _normalize(oracle_df)
    problems: list[str] = []
    if list(got.columns) != list(exp.columns):
        problems.append(f"columns differ: spark={list(got.columns)} oracle={list(exp.columns)}")
        return problems
    if len(got) != len(exp):
        problems.append(f"row count differs: spark={len(got)} oracle={len(exp)}")
        return problems
    for c in got.columns:
        a, b = got[c], exp[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            af = a.astype(float)
            bf = b.astype(float)
            both_nan = af.isna() & bf.isna()
            eq = (af == bf) | both_nan
            if not eq.all():
                i = int((~eq).idxmax())
                diff = abs(af[i] - bf[i]) if not (math.isnan(af[i]) or math.isnan(bf[i])) else float("nan")
                problems.append(
                    f"col {c}: {int((~eq).sum())} value diffs, first at row {i}: "
                    f"spark={af[i]!r} oracle={bf[i]!r} absdiff={diff}"
                )
        else:
            a2 = a.astype(object).where(pd.notna(a), None)
            b2 = b.astype(object).where(pd.notna(b), None)
            neq = [i for i, (x, y) in enumerate(zip(a2, b2)) if x != y]
            if neq:
                i = neq[0]
                problems.append(
                    f"col {c}: {len(neq)} value diffs, first at row {i}: "
                    f"spark={a2[i]!r} oracle={b2[i]!r}"
                )
    return problems
