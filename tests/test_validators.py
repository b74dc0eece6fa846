"""Unit tests mirroring the reference's validator semantics (SURVEY.md §2.4)."""

import pandas as pd

from bgdss_ray.config import NOT_CLASSIFIED, SENTINEL
from bgdss_ray.validators import (
    categorize_by_budget_allocation,
    categorize_series,
    extract_budget_codes,
    extract_currency_values,
    non_sentinel_count,
    sentinel_fill,
    valid_brazilian_date_mask,
    valid_resolution_number_mask,
    validate_brazilian_date,
    validate_resolution_number,
)


def test_resolution_number():
    assert validate_resolution_number("12345/2023")
    assert validate_resolution_number("1/2020")
    assert not validate_resolution_number("123456/2023")  # 6 digits
    assert not validate_resolution_number("123/1999")     # not 20XX
    assert not validate_resolution_number("12a/2023")
    assert not validate_resolution_number("")
    assert not validate_resolution_number(None)
    assert validate_resolution_number("  42/2022  ")      # stripped


def test_brazilian_date_format_and_calendar():
    assert validate_brazilian_date("15/03/2023")
    assert validate_brazilian_date("29/02/2024")       # leap year
    assert not validate_brazilian_date("29/02/2023")   # not a real date
    assert not validate_brazilian_date("31/04/2023")   # April has 30
    assert not validate_brazilian_date("2023-03-15")
    assert not validate_brazilian_date("5/3/2023")     # needs zero padding
    assert not validate_brazilian_date(None)


def test_budget_codes_and_categories():
    assert extract_budget_codes("10.301.0012 e 10.302.44") == ["301", "302"]
    assert extract_budget_codes("nothing") == []
    assert categorize_by_budget_allocation("10.301.0012") == "Atenção Primária"
    assert categorize_by_budget_allocation("99.302.1") == "MAC"
    assert categorize_by_budget_allocation("10.122.1") == "ADM"
    # first code wins (validators.py:126-127)
    assert categorize_by_budget_allocation("10.305.1 10.301.2") == "Vigilância Epidemiológica"
    assert categorize_by_budget_allocation(SENTINEL) == NOT_CLASSIFIED
    assert categorize_by_budget_allocation("") == NOT_CLASSIFIED
    assert categorize_by_budget_allocation("10.999.1") == NOT_CLASSIFIED


def test_currency():
    assert extract_currency_values("custo R$ 1.234,56 e R$10,00") == [
        "R$ 1.234,56",
        "R$10,00",
    ]
    assert extract_currency_values("") == []


def test_vectorized_matches_scalar():
    vals = ["12345/2023", "1/2020", "123456/2023", "", "x/2023", None, " 7/2021 "]
    got = valid_resolution_number_mask(pd.Series(vals)).tolist()
    want = [validate_resolution_number(v) for v in vals]
    assert got == want

    dates = ["15/03/2023", "29/02/2023", "29/02/2024", "31/04/2023", None, "bad"]
    got = valid_brazilian_date_mask(pd.Series(dates)).tolist()
    want = [validate_brazilian_date(v) for v in dates]
    assert got == want

    dots = ["10.301.1", "99.999", SENTINEL, None, "10.305.1 10.301.2"]
    got = categorize_series(pd.Series(dots)).tolist()
    want = [categorize_by_budget_allocation(v) for v in dots]
    assert got == want


def test_sentinel_fill():
    s = pd.Series(["  x  ", "", None, "ok"])
    assert sentinel_fill(s).tolist() == ["x", SENTINEL, SENTINEL, "ok"]
    assert non_sentinel_count(sentinel_fill(s)) == 2
