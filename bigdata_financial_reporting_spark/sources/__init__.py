from bigdata_financial_reporting_spark.sources.catalog import (
    TABLE_SCHEMAS,
    load_table,
    register_views,
)
from bigdata_financial_reporting_spark.sources.readers import (
    read_csv,
    read_json,
    read_parquet,
)
from bigdata_financial_reporting_spark.sources.writers import (
    write_parquet,
    write_single_csv,
)

__all__ = [
    "TABLE_SCHEMAS",
    "load_table",
    "register_views",
    "read_csv",
    "read_json",
    "read_parquet",
    "write_parquet",
    "write_single_csv",
]
