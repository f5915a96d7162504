"""Physical-plan inspection helpers (see package docstring)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: join operators Catalyst can pick, in rough cost order at scale
_JOIN_NODES = (
    "BroadcastHashJoin",
    "ShuffledHashJoin",
    "SortMergeJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text for a DataFrame (node tree + details)."""
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return qe.explainString(mode.fromString("formatted"))


def executed_plan(df: DataFrame) -> str:
    """The physical plan actually selected (post-AQE initial plan)."""
    return df._jdf.queryExecution().executedPlan().toString()


def n_codegen_stages(df: DataFrame) -> int:
    """Whole-stage-codegen subtree count WITHOUT executing the query.

    Under AQE codegen wrapping happens per query stage at
    materialization, so every pre-execution explain reports 0. The
    honest pre-execution check re-plans the same logical plan with AQE
    off (diagnostic only — execution still runs under AQE) and uses the
    `codegen` explain mode, which generates but does not run stage code.
    """
    spark = df.sparkSession
    jvm = spark._jvm
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        jdf = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            df._jdf.sparkSession(), df._jdf.logicalPlan()
        )
        mode = jvm.org.apache.spark.sql.execution.ExplainMode
        text = jdf.queryExecution().explainString(mode.fromString("codegen"))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return int(m.group(1)) if m else 0


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into datasource scans — empty means a full scan
    feeding a post-hoc filter (the reference's model, SURVEY §4.1)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """Per-scan ReadSchema strings — the columns that actually leave
    storage (column pruning check)."""
    return [
        m.group(1).strip()
        for m in re.finditer(r"ReadSchema: (.+)", formatted_plan(df))
    ]


def join_strategies(df: DataFrame) -> list[str]:
    """Join operator names in plan order (e.g. to assert small dims
    broadcast instead of sort-merging).

    Parses only the formatted plan's detail headers ``(N) JoinNode`` —
    each physical node appears once there, while the tree rendering at
    the top would double-count.
    """
    plan = formatted_plan(df)
    found = [
        (int(m.group(1)), m.group(2))
        for m in re.finditer(
            r"^\((\d+)\) (\w*(?:Join|CartesianProduct)\w*)", plan, re.MULTILINE
        )
        if m.group(2) in _JOIN_NODES
    ]
    return [node for _, node in sorted(found)]


def n_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes — the scale-dominating cost."""
    return len(re.findall(r"\bExchange (?:hash|range|Single)", executed_plan(df)))


def plan_report(df: DataFrame) -> dict:
    """One-call summary of the scale-relevant plan properties."""
    plan = formatted_plan(df)
    return {
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "joins": join_strategies(df),
        "n_exchanges": n_exchanges(df),
        "n_codegen_stages": n_codegen_stages(df),
        "partition_filters": "PartitionFilters" in plan,
    }
