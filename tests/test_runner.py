"""Golden test for the report runner (SURVEY.md §5.2): the exact
R6-R13 reference pipeline on a market-data-shaped CSV, outputs checked
value-by-value including the NULL-first-row and zero-divisor semantics,
plus the empty-range branch and validation errors."""

from __future__ import annotations

import csv
import os

import pytest

from bigdata_financial_reporting_spark.runner import run_report, validate_date

CSV_CONTENT = """Date,DOLAR,S&P500
2024-01-01,5.0,100.0
2024-01-02,5.5,110.0
2024-01-03,0.0,99.0
2024-01-04,6.0,120.0
2024-01-05,6.0,0.0
2024-01-06,3.0,50.0
"""


@pytest.fixture()
def dataset(tmp_path):
    p = os.path.join(str(tmp_path), "market_data.csv")
    with open(p, "w") as f:
        f.write(CSV_CONTENT)
    return p


def _read_csv(path):
    with open(path, newline="") as f:
        return list(csv.DictReader(f))


def test_golden_report(spark, dataset, tmp_path):
    out = os.path.join(str(tmp_path), "out")
    res = run_report(spark, dataset, "2024-01-02", "2024-01-05", out)

    assert res["daily_returns_count"] == 4
    assert not res["empty"]
    assert sorted(res["assets"]) == ["DOLAR", "S&P500"]

    rows = _read_csv(res["daily_returns_path"])
    assert [r["Date"] for r in rows] == [
        "2024-01-02", "2024-01-03", "2024-01-04", "2024-01-05",
    ]
    # First row of the RANGE has no predecessor -> NULL (empty cell)
    assert rows[0]["DOLAR_Retorno"] == ""
    # 5.5 -> 0.0 is -100%
    assert float(rows[1]["DOLAR_Retorno"]) == pytest.approx(-100.0)
    # 0.0 -> 6.0 divides by zero -> NULL, not an error (ANSI off)
    assert rows[2]["DOLAR_Retorno"] == ""
    assert float(rows[3]["DOLAR_Retorno"]) == pytest.approx(0.0)

    # S&P500: 110->99 = -10%, 99->120 = +21.2121…%, 120->0 = -100%
    assert float(rows[1]["S&P500_Retorno"]) == pytest.approx(-10.0)
    assert float(rows[2]["S&P500_Retorno"]) == pytest.approx(2100 / 99)
    assert float(rows[3]["S&P500_Retorno"]) == pytest.approx(-100.0)

    # Averages skip NULLs: DOLAR mean over (-100, 0) = -50
    avg = res["averages"]
    assert avg["Media_DOLAR_Retorno"] == pytest.approx(-50.0)
    assert avg["Media_S&P500_Retorno"] == pytest.approx((-10.0 + 2100 / 99 - 100.0) / 3)

    # The averages CSV exists and matches the summary
    avg_rows = _read_csv(res["average_daily_return_path"])
    assert len(avg_rows) == 1
    assert float(avg_rows[0]["Media_DOLAR_Retorno"]) == pytest.approx(-50.0)


def test_empty_range_branch(spark, dataset, tmp_path):
    res = run_report(
        spark, dataset, "2030-01-01", "2030-12-31", os.path.join(str(tmp_path), "o")
    )
    assert res["empty"] and res["daily_returns_count"] == 0


def test_validation_errors(spark, dataset, tmp_path):
    out = os.path.join(str(tmp_path), "o")
    with pytest.raises(ValueError, match="yyyy-MM-dd"):
        run_report(spark, dataset, "01/02/2024", "2024-01-05", out)
    with pytest.raises(ValueError, match="precedes"):
        run_report(spark, dataset, "2024-01-05", "2024-01-02", out)
    with pytest.raises(ValueError, match="no 'Fecha'"):
        run_report(spark, dataset, "2024-01-02", "2024-01-05", out, date_col="Fecha")
    validate_date("2024-02-29")  # leap day is fine


def test_multipart_output_mode(spark, dataset, tmp_path):
    out = os.path.join(str(tmp_path), "o")
    res = run_report(
        spark, dataset, "2024-01-01", "2024-01-06", out, single_file=False
    )
    # directory of part files, standard Spark layout
    assert os.path.isdir(res["daily_returns_path"])
    parts = [p for p in os.listdir(res["daily_returns_path"]) if p.startswith("part-")]
    assert parts
