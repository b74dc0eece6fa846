"""Work-spec generation: the crawl "query" — year/month/municipality
configs → the seed frontier cross product.

Reproduces the reference's config semantics:
  - years list builders single/range/multiple/all (mds_saldo.py:139-152;
    'all' = 2011..current year — current year is a parameter here, never
    the wall clock, for determinism);
  - months list builders single/multiple/all, legacy int with 13 = all
    (mds_saldo.py:154-170);
  - the month-set text parser "1,3,5-8,12" → sorted union of singles and
    ranges with the same validation rules (mds_saldo_ui.py:716-781);
  - portal semantics year==999 → all years, month==13 → all months
    (portal_saude_ui.py:223-247).

The cross product is emitted as seed frontier rows (SURVEY.md §2.10) — one
row per (site, year, month, municipality) combination, driver-side (the
work list is tiny; the frontier it seeds is not).
"""

from __future__ import annotations

from typing import Any


class WorkSpecError(ValueError):
    pass


def parse_month_spec(months_str: str) -> list[int]:
    """'1,3,5-8,12' → sorted unique [1,3,5,6,7,8,12] (mds_saldo_ui.py:716-781)."""
    months: set[int] = set()
    parts = [p.strip() for p in months_str.split(",")]
    for part in parts:
        if "-" in part:
            range_parts = part.split("-")
            if len(range_parts) != 2:
                raise WorkSpecError(f"invalid range format: {part!r}")
            start, end = int(range_parts[0].strip()), int(range_parts[1].strip())
            if start < 1 or start > 12 or end < 1 or end > 12:
                raise WorkSpecError("months must be 1..12")
            if start > end:
                raise WorkSpecError("range start must be <= end")
            months.update(range(start, end + 1))
        else:
            m = int(part)
            if m < 1 or m > 12:
                raise WorkSpecError("months must be 1..12")
            months.add(m)
    if not months:
        raise WorkSpecError("at least one month required")
    return sorted(months)


def years_list(year_config: dict[str, Any] | int, current_year: int = 2023) -> list[int]:
    """mds_saldo.py:139-152 semantics; 999 = all (portal_saude_ui.py:223-247)."""
    if isinstance(year_config, int):
        if year_config == 999:
            return list(range(2011, current_year + 1))
        return [year_config]
    t = year_config.get("type")
    if t == "single":
        return [year_config["year"]]
    if t == "range":
        return list(range(year_config["start_year"], year_config["end_year"] + 1))
    if t == "multiple":
        return list(year_config["years"])
    if t == "all":
        return list(range(2011, current_year + 1))
    return [current_year]


def months_list(month_config: dict[str, Any] | int) -> list[int]:
    """mds_saldo.py:154-170 semantics; legacy int, 13 = all."""
    if isinstance(month_config, dict):
        t = month_config.get("type")
        if t == "single":
            return [month_config["month"]]
        if t == "multiple":
            return list(month_config["months"])
        if t == "all":
            return list(range(1, 13))
    else:
        if month_config == 13:
            return list(range(1, 13))
        if 1 <= month_config <= 12:
            return [month_config]
    return [1]


def seed_work_rows(
    sites: list[str],
    year_config: dict[str, Any] | int,
    month_config: dict[str, Any] | int,
    municipalities: list[str] | None = None,
    current_year: int = 2023,
) -> list[dict]:
    """The cross product as seed work rows (one per combination), in the
    reference's loop-nest order: site → year → month → municipality
    (mds_saldo.py:86-103,296-389)."""
    rows: list[dict] = []
    seq = 0
    munis = municipalities if municipalities else [None]
    for site in sites:
        for y in years_list(year_config, current_year):
            for m in months_list(month_config):
                for muni in munis:
                    rows.append(
                        {
                            "site": site,
                            "year": y,
                            "month": m,
                            "municipality": muni,
                            "seq": seq,
                        }
                    )
                    seq += 1
    return rows


def seeds_from_work_rows(rows: list[dict], url_template: str) -> list[dict]:
    """Work rows → seed frontier rows for pipeline.crawl (url + seq)."""
    out = []
    for r in rows:
        out.append(
            {
                "url": url_template.format(**r),
                "title": f"{r['site']} {r['year']}-{r['month']:02d}",
                "seq": r["seq"],
            }
        )
    return out
