"""Scalar/string function library — the reference's validator surface,
vectorized.

Mirrors /root/reference/src/utils/validators.py (patterns :17-20, category
map :23-32, behaviors :34-194) with pandas/pyarrow kernels operating on whole
columns instead of per-string calls. Scalar variants are kept for the oracle
and unit tests; batch variants are what pipeline stages call.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .config import NOT_CLASSIFIED, SENTINEL

# patterns identical to reference validators.py:17-20
RESOLUTION_NUMBER = re.compile(r"^\d{1,5}/20\d{2}$")
BRAZILIAN_DATE = re.compile(r"^\d{2}/\d{2}/\d{4}$")
BUDGET_CODES = re.compile(r"\b(301|302|303|304|305|306|122|242)\b")
CURRENCY = re.compile(r"R\$\s*[\d.,]+")

# category map identical to reference validators.py:23-32
BUDGET_CATEGORIES = {
    "301": "Atenção Primária",
    "302": "MAC",
    "303": "Assistência Farmacêutica",
    "304": "Vigilância Sanitária",
    "305": "Vigilância Epidemiológica",
    "306": "Alimentação e Nutrição",
    "122": "ADM",
    "242": "Assist. ao Portador de Deficiência",
}


# -- scalar variants (oracle/tests; semantics == reference) ----------------
def validate_resolution_number(number) -> bool:
    if not number or not isinstance(number, str):
        return False
    return bool(RESOLUTION_NUMBER.match(number.strip()))


def validate_brazilian_date(date_str) -> bool:
    """Format AND real calendar date (reference validators.py:49-75)."""
    if not date_str or not isinstance(date_str, str):
        return False
    s = date_str.strip()
    if not BRAZILIAN_DATE.match(s):
        return False
    d, m, y = s.split("/")
    try:
        from datetime import datetime

        datetime(int(y), int(m), int(d))
        return True
    except ValueError:
        return False


def extract_budget_codes(text) -> list[str]:
    if not text or not isinstance(text, str):
        return []
    return BUDGET_CODES.findall(text)


def extract_currency_values(text) -> list[str]:
    if not text or not isinstance(text, str):
        return []
    return CURRENCY.findall(text)


def categorize_by_budget_allocation(dotacao) -> str:
    """First budget code found decides the category (validators.py:108-129)."""
    if not dotacao or dotacao == SENTINEL:
        return NOT_CLASSIFIED
    codes = extract_budget_codes(dotacao)
    if codes:
        return BUDGET_CATEGORIES.get(codes[0].strip(), NOT_CLASSIFIED)
    return NOT_CLASSIFIED


# -- vectorized variants (pipeline stages) ---------------------------------
def valid_resolution_number_mask(s: pd.Series) -> pd.Series:
    return s.fillna("").str.strip().str.match(RESOLUTION_NUMBER).fillna(False)


def valid_brazilian_date_mask(s: pd.Series) -> pd.Series:
    stripped = s.fillna("").str.strip()
    fmt_ok = stripped.str.match(BRAZILIAN_DATE).fillna(False)
    parsed = pd.to_datetime(stripped.where(fmt_ok), format="%d/%m/%Y", errors="coerce")
    return fmt_ok & parsed.notna()


def first_budget_code(s: pd.Series) -> pd.Series:
    return s.fillna("").str.extract(BUDGET_CODES, expand=False)


def categorize_series(dotacao: pd.Series) -> pd.Series:
    """Vectorized categorize_by_budget_allocation."""
    codes = first_budget_code(dotacao)
    out = codes.map(BUDGET_CATEGORIES)
    out = out.where(codes.notna(), NOT_CLASSIFIED)
    out = out.where(dotacao.fillna(SENTINEL) != SENTINEL, NOT_CLASSIFIED)
    return out.fillna(NOT_CLASSIFIED)


def sentinel_fill(s: pd.Series) -> pd.Series:
    """strip, cast to str, empty/None → sentinel (pdf_data_to_table.py:232-263)."""
    out = s.astype("string").str.strip()
    return out.where(out.notna() & (out != ""), SENTINEL).astype(str)


def non_sentinel_count(s: pd.Series) -> int:
    return int((s.fillna(SENTINEL) != SENTINEL).sum())
