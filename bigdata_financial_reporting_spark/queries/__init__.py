"""Query registry: one named entry per operator in SURVEY.md §2B.

Each registered query is a ``(spark, sf_dir) -> DataFrame`` callable,
optionally paired with an ANSI-SQL oracle string DuckDB can run over
the same parquet fixtures. The driver (and our own tests) execute both
sides and compare row-count + schema + order-insensitive value hash.

Importing this package populates the registry.
"""

from bigdata_financial_reporting_spark.queries.registry import (
    QUERIES,
    QuerySpec,
    oracle_sql_map,
    queries_map,
    register,
)

# Import for side effect: each module registers its queries.
from bigdata_financial_reporting_spark.queries import (  # noqa: E402,F401
    aggregates,
    components,
    dedup,
    fin_timeseries,
    functions_scalar,
    joins,
    llm_text,
    multimodal,
    ops_tools,
    reference_pipeline,
    relational,
    rollup_ts,
    similarity,
    skew,
    sources_sinks,
    streaming_queries,
    timeseries,
    udfs,
    windows,
)

__all__ = ["QUERIES", "QuerySpec", "register", "queries_map", "oracle_sql_map"]
