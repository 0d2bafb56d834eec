from rtdl_spark.plans.inspect import (
    PlanReport,
    broadcast_join_count,
    codegen_span_count,
    exchange_count,
    formatted_plan,
    plan_report,
    pushed_filters,
    scan_read_schemas,
)

__all__ = [
    "PlanReport",
    "broadcast_join_count",
    "codegen_span_count",
    "exchange_count",
    "formatted_plan",
    "plan_report",
    "pushed_filters",
    "scan_read_schemas",
]
