from bigdata_financial_reporting_spark.plans.inspect import (
    count_exchanges,
    has_broadcast_hash_join,
    physical_plan,
    plan_report,
    pushed_filters,
    scan_read_schema,
)

__all__ = [
    "physical_plan",
    "plan_report",
    "has_broadcast_hash_join",
    "count_exchanges",
    "pushed_filters",
    "scan_read_schema",
]
