"""External-API ingest (reference R1 parity).

The reference pulls market data into a pandas frame, fills missing
values, renames columns, and stages a date-stamped CSV that later runs
reuse instead of re-downloading (reference controller/app.py:231-292,
``fetch_latest_dataset``). The engine equivalent splits that into:

- ``ingest_pandas``: pandas -> Spark DataFrame with the same
  normalization contract (fillna, validated rename map, ``^`` ticker
  prefix stripping, index promoted to a column);
- ``stage_dataset``: the date-stamped CSV cache around any fetcher
  callable. The fetcher is injected because the actual downloader
  (yfinance in the reference) is an external API: callers pass their
  own, tests pass a fake.

Scale posture: ingest is a driver-side convenience for SMALL external
pulls (the reference's use case — a handful of tickers). Bulk data
enters through the parquet/CSV readers, never through pandas.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Mapping
from datetime import date

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def normalize_pandas(
    pdf: pd.DataFrame,
    column_mapping: Mapping[str, str] | None = None,
    fill_value: float | None = 0.0,
    index_name: str | None = None,
) -> pd.DataFrame:
    """Apply the reference's R1 normalization to a pandas frame.

    Mirrors controller/app.py:231-292: fill missing values (the
    reference uses 0), rename via an explicit mapping — raising
    ``KeyError`` naming every missing source column, as the reference
    does — or, with no mapping, strip the ``^`` index-ticker prefix
    from column names. A named index (yfinance's Date) is promoted to
    an ordinary column so it survives the trip into Spark.
    """
    out = pdf.copy()
    if fill_value is not None:
        out = out.fillna(fill_value)
    if column_mapping:
        missing = [c for c in column_mapping if c not in out.columns]
        if missing:
            raise KeyError(f"columns to rename are absent from the frame: {missing}")
        out = out.rename(columns=dict(column_mapping))
    else:
        out.columns = [str(c).replace("^", "") for c in out.columns]
    if index_name is not None:
        out = out.reset_index().rename(columns={out.index.name or "index": index_name})
    elif out.index.name is not None:
        out = out.reset_index()
    return out


def ingest_pandas(
    spark: SparkSession,
    pdf: pd.DataFrame,
    column_mapping: Mapping[str, str] | None = None,
    fill_value: float | None = 0.0,
    index_name: str | None = None,
) -> DataFrame:
    """pandas -> Spark DataFrame with R1 normalization applied.

    Arrow handles the transfer (spark.sql.execution.arrow.pyspark
    enabled in session defaults), so the frame lands columnar without
    per-row pickling.
    """
    return spark.createDataFrame(
        normalize_pandas(pdf, column_mapping, fill_value, index_name)
    )


def stage_dataset(
    fetch: Callable[[], pd.DataFrame],
    dataset_dir: str,
    prefix: str = "market_data",
    stamp: str | None = None,
    column_mapping: Mapping[str, str] | None = None,
    fill_value: float | None = 0.0,
) -> str:
    """Date-stamped CSV staging cache (reference R1 behavior).

    The target file is ``{dataset_dir}/{prefix}_{stamp}.csv`` with
    ``stamp`` defaulting to today — if it already exists the fetcher is
    NOT called and the existing path is returned, exactly the
    reference's skip-if-cached contract (controller/app.py:259-262).
    Otherwise ``fetch()`` runs, normalization is applied, and the frame
    is written WITHOUT the pandas index: normalization already promotes
    a named index (yfinance's Date) to an ordinary column, so writing
    the index again would add a junk unnamed RangeIndex column the
    reference's CSV does not have (round-2 ADVICE).
    """
    stamp = stamp or date.today().isoformat()
    path = os.path.join(dataset_dir, f"{prefix}_{stamp}.csv")
    if os.path.exists(path):
        return path
    pdf = normalize_pandas(fetch(), column_mapping, fill_value)
    os.makedirs(dataset_dir, exist_ok=True)
    pdf.to_csv(path, index=False)
    return path
