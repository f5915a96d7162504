"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registry query in Spark and its oracle SQL in DuckDB on the same
parquet tables, then compares row count, column names, and exact values
(columns sorted by name, rows sorted by all columns) — a stricter local
stand-in for the driver's order-insensitive value-hash.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
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


def _kind(dtype) -> str:
    """Collapse a dtype to the class the driver's value-hash distinguishes.

    The driver hashes the canonicalized pandas frame without coercing
    dtypes, so int64 2977 vs float64 2977.0 hash differently even though
    the values compare equal (round-1 `orders_status_summary` failure).
    """
    k = dtype.kind
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "M":
        return "datetime"
    if k == "b":
        return "bool"
    return "object"


def unhashable_cells(df: pd.DataFrame) -> list[str]:
    """Columns whose cells the driver's rows-only hasher cannot hash.

    Lists / ndarrays / dicts in object columns break pandas sort_values
    (round-1 `minhash_signatures_docs` / `approx_profile_events` errors).
    """
    bad = []
    for c in df.columns:
        if df[c].dtype.kind == "O":
            head = df[c].dropna().head(50)
            if any(isinstance(v, (list, dict, set, np.ndarray)) for v in head):
                bad.append(c)
    return bad


def compare(spark_df, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    got_raw = spark_df.toPandas()
    for side, df in (("spark", got_raw), ("oracle", oracle_df)):
        bad = unhashable_cells(df)
        if bad:
            return [f"{side} output has unhashable cells in {bad} — driver hasher would error"]
    got = _normalize(got_raw)
    exp = _normalize(oracle_df)
    problems: list[str] = []
    if list(got.columns) != list(exp.columns):
        problems.append(f"columns differ: spark={list(got.columns)} oracle={list(exp.columns)}")
        return problems
    if len(got) != len(exp):
        problems.append(f"row count differs: spark={len(got)} oracle={len(exp)}")
        return problems
    for c in got.columns:
        ka, kb = _kind(got[c].dtype), _kind(exp[c].dtype)
        if ka != kb:
            problems.append(
                f"col {c}: dtype-class drift spark={got[c].dtype}({ka}) "
                f"oracle={exp[c].dtype}({kb}) — driver value-hash would diverge"
            )
    if problems:
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
