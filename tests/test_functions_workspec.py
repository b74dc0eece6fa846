"""Scalar functions, work-spec generators, municipality normalizer."""

import pytest
import ray.data as rd
import pandas as pd

from bgdss_ray.functions import (
    clean_markdown_reply,
    extract_json_from_markdown,
    month_dir_name,
    sequential_pdf_name,
    slug_sanitize,
)
from bgdss_ray.normalize import (
    NOT_FOUND,
    MunicipalityNormalizer,
    match_municipality,
    normalize_municipalities,
)
from bgdss_ray.workspec import (
    WorkSpecError,
    months_list,
    parse_month_spec,
    seed_work_rows,
    seeds_from_work_rows,
    years_list,
)


def test_month_spec_parser():
    assert parse_month_spec("1,3,5-8,12") == [1, 3, 5, 6, 7, 8, 12]
    assert parse_month_spec("1-3") == [1, 2, 3]
    assert parse_month_spec("12") == [12]
    assert parse_month_spec("3, 1 , 2") == [1, 2, 3]
    assert parse_month_spec("5-5") == [5]
    for bad in ("0", "13", "5-2", "1-13", "1-2-3", "a"):
        with pytest.raises((WorkSpecError, ValueError)):
            parse_month_spec(bad)


def test_years_list_variants():
    assert years_list({"type": "single", "year": 2020}) == [2020]
    assert years_list({"type": "range", "start_year": 2019, "end_year": 2021}) == [2019, 2020, 2021]
    assert years_list({"type": "multiple", "years": [2015, 2018]}) == [2015, 2018]
    assert years_list({"type": "all"}, current_year=2013) == [2011, 2012, 2013]
    assert years_list(999, current_year=2012) == [2011, 2012]
    assert years_list(2017) == [2017]
    assert years_list({}, current_year=2023) == [2023]  # fallback


def test_months_list_variants():
    assert months_list({"type": "single", "month": 4}) == [4]
    assert months_list({"type": "multiple", "months": [2, 9]}) == [2, 9]
    assert months_list({"type": "all"}) == list(range(1, 13))
    assert months_list(13) == list(range(1, 13))  # legacy int, 13 = all
    assert months_list(7) == [7]
    assert months_list(99) == [1]  # fallback


def test_cross_product_order_and_seq():
    rows = seed_work_rows(
        ["siteA"], {"type": "range", "start_year": 2022, "end_year": 2023},
        {"type": "multiple", "months": [1, 2]}, ["X", "Y"],
    )
    assert len(rows) == 8
    assert [r["seq"] for r in rows] == list(range(8))
    # loop-nest order: year outer, month inner, municipality innermost
    assert (rows[0]["year"], rows[0]["month"], rows[0]["municipality"]) == (2022, 1, "X")
    assert (rows[3]["year"], rows[3]["month"], rows[3]["municipality"]) == (2022, 2, "Y")
    seeds = seeds_from_work_rows(rows, "https://h.gov.br/q?y={year}&m={month}")
    assert seeds[0]["url"].endswith("y=2022&m=1")


def test_filename_builders():
    assert month_dir_name("03") == "03_marco"
    assert month_dir_name("99") == "99_99"
    assert slug_sanitize("Belo Horizonte-2023_x!") == "belohorizonte-2023_x"
    assert sequential_pdf_name("03", 2023, 7) == "03-2023-RES-007.pdf"


def test_json_fence_extractor():
    fenced = '```json\n{"a": 1}\n```'
    assert extract_json_from_markdown(fenced) == '{"a": 1}'
    assert extract_json_from_markdown('{"a": 1}') == '{"a": 1}'
    assert extract_json_from_markdown("plain text") == "plain text"


def test_markdown_cleaner():
    assert clean_markdown_reply("## Header\nBelo Horizonte") == "Belo Horizonte"
    assert clean_markdown_reply("[Uberaba](http://x)") == "Uberaba"
    assert clean_markdown_reply('**"Betim"**') == "Betim"


def test_match_municipality_exact_then_substring():
    opts = ["BELO HORIZONTE", "Betim", "Uberaba"]
    assert match_municipality("belo horizonte", opts) == "BELO HORIZONTE"
    assert match_municipality("BETIM", opts) == "Betim"
    assert match_municipality("uber", opts) == "Uberaba"  # substring fallback
    assert match_municipality("nope", opts) is None


def test_normalizer_stage(ray_session):
    dim = {"MG": ["Belo Horizonte", "Betim", "Uberaba"]}
    df = pd.DataFrame(
        {"uf": ["MG", "MG", "MG"], "municipality": ["betim", "uber", "xx"]}
    )
    out = normalize_municipalities(rd.from_pandas(df), dim, concurrency=1).to_pandas()
    assert out["municipality_norm"].tolist() == ["Betim", "Uberaba", NOT_FOUND]
    assert out["muni_found"].tolist() == [True, True, False]


def test_normalizer_cache():
    n = MunicipalityNormalizer({"MG": ["Betim"]})
    assert n.lookup("MG", "betim") == "Betim"
    assert ("MG:BETIM") in n.cache
    assert n.lookup("mg", "BETIM") == "Betim"  # case-insensitive cache key
