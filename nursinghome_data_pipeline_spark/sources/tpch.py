"""Loader for the driver-generated star-schema parquet test tables.

See /root/repo/TESTDATA.md: tables ``region nation customer supplier
part orders lineitem events documents embeddings`` live as one parquet
file per table under ``/root/testdata/sf{0.001,0.01,0.1}``.

At 100 TB these would be partitioned datasets (e.g. orders partitioned
by month of o_orderdate); ``spark.read.parquet`` on a directory behaves
identically, so every downstream plan is unchanged — Catalyst handles
partition pruning from pushed-down filters.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dimension tables small enough to broadcast at any scale factor
BROADCAST_DIMS = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS); where the reader rejects
    it (pre-native-NANOS Spark), read it as a nanosecond long and
    truncate to microsecond timestamps — the same ns→us truncation
    DuckDB applies, so oracle comparisons see identical instants.

    The legacy conf is RESTORED after the read: the resolved relation
    keeps its schema, and leaving the session-wide flag set would make
    every later parquet read in the caller's session silently decode
    unrelated NANOS columns as raw longs."""
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(path)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | list[str] = TABLES
) -> dict[str, DataFrame]:
    """Load the requested tables as DataFrames (lazy parquet scans)."""
    return {
        n: _load_events(spark, table_path(sf_dir, n))
        if n == "events"
        else spark.read.parquet(table_path(sf_dir, n))
        for n in names
    }


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | list[str] = TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view (for the SQL surface)."""
    dfs = load_tables(spark, sf_dir, names)
    for n, df in dfs.items():
        df.createOrReplaceTempView(n)
    return dfs
