"""R1 ingest parity (reference controller/app.py:231-292): fillna,
validated rename, ^-prefix stripping, date-stamped staging cache."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bigdata_financial_reporting_spark.sources.ingest import (
    ingest_pandas,
    normalize_pandas,
    stage_dataset,
)


def market_pdf():
    idx = pd.to_datetime(["2024-01-02", "2024-01-03", "2024-01-04"])
    idx.name = "Date"
    return pd.DataFrame(
        {"BRL=X": [4.85, np.nan, 4.91], "^BVSP": [132000.0, 133500.0, np.nan]},
        index=idx,
    )


def test_ingest_pandas_rename_and_fillna(spark):
    df = ingest_pandas(
        spark, market_pdf(), column_mapping={"BRL=X": "DOLAR", "^BVSP": "IBOVESPA"}
    )
    assert set(df.columns) == {"Date", "DOLAR", "IBOVESPA"}
    rows = {r.Date.date().isoformat(): (r.DOLAR, r.IBOVESPA) for r in df.collect()}
    assert rows["2024-01-03"] == (0.0, 133500.0)  # fillna(0), reference contract
    assert rows["2024-01-04"] == (4.91, 0.0)


def test_ingest_pandas_missing_rename_column_raises(spark):
    with pytest.raises(KeyError, match="GOLD=X"):
        ingest_pandas(spark, market_pdf(), column_mapping={"GOLD=X": "OURO"})


def test_normalize_strips_caret_without_mapping():
    out = normalize_pandas(market_pdf())
    assert list(out.columns) == ["Date", "BRL=X", "BVSP"]


def test_stage_dataset_caches_by_stamp(tmp_path):
    calls = []

    def fetch():
        calls.append(1)
        return market_pdf()

    p1 = stage_dataset(fetch, str(tmp_path), prefix="market_data", stamp="2024-01-05")
    p2 = stage_dataset(fetch, str(tmp_path), prefix="market_data", stamp="2024-01-05")
    assert p1 == p2
    assert p1.endswith("market_data_2024-01-05.csv")
    assert len(calls) == 1, "cached stamp must not re-fetch"
    staged = pd.read_csv(p1)
    assert "Date" in staged.columns  # Date survives, as the reference's CSV does
    # no junk unnamed RangeIndex column (round-2 ADVICE): the promoted
    # Date column is written once, the pandas index not at all
    assert not [c for c in staged.columns if c.startswith("Unnamed")]
    assert list(staged.columns) == ["Date", "BRL=X", "BVSP"]
    assert staged["BRL=X"].tolist() == [4.85, 0.0, 4.91]
