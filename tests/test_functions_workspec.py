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


def test_year_scan_earlystop(ray_session):
    from bgdss_ray.workspec import scan_years_with_earlystop

    years = [2023, 2022, 2021, 2020, 2019, 2018, 2017, 2016]
    counts = {2023: 5, 2022: 3}  # everything older empty
    got = scan_years_with_earlystop(years, counts)
    # 2021/2020/2019 empty but gap <= 3; 2018 (gap 4 from 2022) stops
    assert got == [2023, 2022, 2021, 2020, 2019, 2018]
    # no data at all: never stops (reference: stop needs a prior data year)
    assert scan_years_with_earlystop(years, {}) == years


def test_month_scan_until_empty():
    from bgdss_ray.workspec import scan_months_until_empty

    counts = {1: 4, 2: 7, 3: 0, 4: 9}
    assert scan_months_until_empty([1, 2, 3, 4, 5], counts) == [1, 2, 3]
    assert scan_months_until_empty([1, 2], {1: 1, 2: 1}) == [1, 2]


def test_drop_future_months():
    from bgdss_ray.workspec import drop_future_months

    assert drop_future_months(2022, [1, 6, 12], 2023, 5) == [1, 6, 12]
    assert drop_future_months(2024, [1, 6, 12], 2023, 5) == []
    assert drop_future_months(2023, [1, 5, 6, 12], 2023, 5) == [1, 5]


def test_period_counts_and_prune(ray_session):
    import pandas as pd
    import ray.data as rd

    from bgdss_ray.workspec import period_counts, prune_workspec, seed_work_rows

    docs = pd.DataFrame(
        {"doc_id": range(10),
         "year": [2023] * 4 + [2022] * 6}
    )
    counts = period_counts(rd.from_pandas(docs), "year")
    assert counts == {2023: 4, 2022: 6}
    rows = seed_work_rows(
        ["portal"],
        {"type": "range", "start_year": 2016, "end_year": 2023},
        {"type": "all"},
    )
    pruned = prune_workspec(rows, {2023: 4, 2022: 6})
    # seed_work_rows ascends 2016..2023; in ascending order the gap to the
    # last data year is never positive, so nothing stops — all rows survive
    years = sorted({r["year"] for r in pruned})
    assert years == list(range(2016, 2024))
    # newest-first pruning drops years older than (2022 - 3)
    rows_desc = sorted(rows, key=lambda r: -r["year"])
    pruned_desc = prune_workspec(rows_desc, {2023: 4, 2022: 6})
    years_desc = sorted({r["year"] for r in pruned_desc})
    assert years_desc == [2018, 2019, 2020, 2021, 2022, 2023]
    # future-month skip composes
    pruned_fm = prune_workspec(rows_desc, {2023: 4, 2022: 6},
                               now_year=2023, now_month=3)
    assert all(r["month"] <= 3 for r in pruned_fm if r["year"] == 2023)
    assert any(r["month"] == 12 for r in pruned_fm if r["year"] == 2022)
