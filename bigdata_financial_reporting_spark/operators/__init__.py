from bigdata_financial_reporting_spark.operators.asof import asof_join
from bigdata_financial_reporting_spark.operators.topk import top_k_per_group

__all__ = ["asof_join", "top_k_per_group"]
