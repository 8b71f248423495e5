"""PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference financial-reporting pipeline (see /root/reference, surveyed in
SURVEY.md), extended with the LLM-data-pipeline operator families
(dedup, similarity search, multimodal columns, text analysis) and
designed for 100 TB scale: declarative DataFrame plans, Catalyst-owned
physical strategy, broadcast hints for small dimensions, partitioned
windows, and no driver-side loops in any hot path.
"""

from bigdata_financial_reporting_spark.session import get_session, pin_semantics

__all__ = ["get_session", "pin_semantics"]
__version__ = "0.1.0"
