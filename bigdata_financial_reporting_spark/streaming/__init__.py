from bigdata_financial_reporting_spark.streaming.runner import (
    events_stream,
    run_available_now,
)

__all__ = ["events_stream", "run_available_now"]
