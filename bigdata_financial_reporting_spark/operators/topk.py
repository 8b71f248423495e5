"""Top-k per group — window rank composition.

Spark has no QUALIFY; the idiomatic form is ``row_number`` over a
partitioned window plus a filter, which Catalyst executes as a single
shuffle on the group keys followed by a streaming rank — and since
Spark 3.5, a ``WindowGroupLimit(Partial)`` stage prunes each MAP
partition to k rows per group BEFORE the exchange, so even a
low-cardinality group key (3 distinct values) never funnels the full
table through |groups| tasks: the shuffle carries at most
k x groups x map-partitions rows. Plan pinned by
tests/test_plans.py::test_topk_per_group_prunes_map_side_before_exchange;
two explicit two-phase rewrites measured SLOWER at sf0.1 (SCALING.md
"Round-4"). The only full-data work is the embarrassingly-parallel
per-partition sort feeding the Partial stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Keep the first ``k`` rows of each group under a TOTAL order.

    ``order_cols`` must define a total order within each group
    (append a unique key as tie-break) or the result is
    nondeterministic.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)
