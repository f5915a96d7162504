"""Plan inspection: programmatic access to Catalyst's physical-plan
decisions (pushdown, pruning, join strategy, shuffle count).

The reference has no optimizer (SURVEY §4.1) — its "plan" is script
order. Here the optimizer is Catalyst, so the engine's scale contract
(SCALE.md) is expressed as assertions over the OPTIMIZED plan: these
helpers are what tests/test_plan_quality.py and the CLI `explain`
command use to verify that the plan Catalyst picked is the plan the
operator was designed to produce at 100 TB.
"""

from .inspect import (
    executed_plan,
    formatted_plan,
    join_strategies,
    n_codegen_stages,
    n_exchanges,
    plan_report,
    pushed_filters,
    read_schemas,
)

__all__ = [
    "executed_plan",
    "formatted_plan",
    "join_strategies",
    "n_codegen_stages",
    "n_exchanges",
    "plan_report",
    "pushed_filters",
    "read_schemas",
]
